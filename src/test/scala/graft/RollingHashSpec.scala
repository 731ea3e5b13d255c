package graft

import org.apache.spark.sql.functions._

/** The native rolling_hash expression vs the composed
  * aggregate(split(text,''), ascii) fold it replaced — bit-equal,
  * including multibyte and astral (surrogate-pair) characters.
  */
class RollingHashSpec extends SparkSpecBase {

  private def composed = {
    val chars = filter(split(col("t"), ""), c => c =!= "")
    aggregate(chars, lit(0L), (acc, c) => (acc * 31 + ascii(c)) % 1000000007L)
  }

  test("native equals composed on the real documents corpus") {
    val s = spark
    import s.implicits._
    val rows = graft.core.Tables(s, sf("sf0.001")).documents
      .select(col("text").as("t"))
      .select(call_function("rolling_hash", $"t").as("native"), composed.as("c"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._1 == r._2))
  }

  test("native equals composed on unicode edge cases") {
    val s = spark
    import s.implicits._
    val edge = Seq("", "a", "abc def", "中文 字符", "héllo wörld", "mix中a😀b",
      "😀😀", "é́") // astral pairs, combining accent
    val rows = edge.toDF("t")
      .select($"t", call_function("rolling_hash", $"t").as("native"), composed.as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch on '${r.getString(0)}'")
    }
    // empty string folds to the initial 0 on both sides
    assert(rows.find(_.getString(0) == "").exists(_.getLong(1) == 0L))
  }

  test("rolling_hash resolves through SQL") {
    assert(spark.sql("SELECT rolling_hash('ab')").head.getLong(0) ==
      (97L * 31 + 98) % 1000000007L)
  }
}
