package graft.text

/** Deterministic hanzi→pinyin transliteration table — the dictionary
  * resource behind [[Analyzer.withPinyin]] (3.0 feature inventory §3
  * "pinyin filter"). This is a stand-in covering the sandbox corpus;
  * the analyzer accepts any table, so a deployment loads the full
  * Unihan readings file through the same dictionary-resource
  * parameter instead. Tone marks are dropped (the flat-pinyin output
  * the reference's ES-style pinyin filter emits by default).
  */
object Pinyin {
  val table: Map[String, String] = Map(
    "向" -> "xiang", "量" -> "liang", "数" -> "shu", "据" -> "ju",
    "库" -> "ku", "搜" -> "sou", "索" -> "suo", "引" -> "yin",
    "擎" -> "qing", "北" -> "bei", "京" -> "jing", "上" -> "shang",
    "海" -> "hai", "世" -> "shi", "界" -> "jie", "中" -> "zhong",
    "文" -> "wen", "分" -> "fen", "词" -> "ci", "器" -> "qi",
    "检" -> "jian", "全" -> "quan", "表" -> "biao", "达" -> "da",
    "式" -> "shi", "过" -> "guo", "滤" -> "lv", "高" -> "gao",
    "亮" -> "liang", "同" -> "tong", "义" -> "yi", "近" -> "jin",
    "似" -> "si", "度" -> "du", "排" -> "pai", "序" -> "xu",
    "聚" -> "ju", "合" -> "he", "流" -> "liu", "处" -> "chu",
    "理" -> "li", "压" -> "ya", "缩" -> "suo", "升" -> "sheng",
    "级" -> "ji", "回" -> "hui", "滚" -> "gun", "兼" -> "jian",
    "容" -> "rong", "性" -> "xing")
}
