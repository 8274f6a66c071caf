package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.ch

/** Scalar parity-layer unit tests (reference semantics from
  * dbms/src/Functions — values derived from the documented bucket
  * definitions, not from reference code execution). */
class ChFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).collect()(0).get(0)

  test("transform remaps values with default") {
    val df = Seq("O", "F", "X").toDF("s")
      .select(ch.transform(col("s"), Seq("O", "F"), Seq("open", "fin"), "other").as("r"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("open", "fin", "other"))
  }

  test("multiIf picks first matching branch") {
    val df = Seq(1, 5, 50).toDF("x").select(
      ch.multiIf(Seq((col("x") < 3, lit("lo")), (col("x") < 10, lit("mid"))), lit("hi")).as("r"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("lo", "mid", "hi"))
  }

  test("roundAge buckets match reference definition") {
    val in = Seq(0, 10, 20, 30, 40, 50, 90)
    val out = in.toDF("a").select(ch.roundAge(col("a")).as("r")).collect().map(_.getInt(0)).toSeq
    assert(out === Seq(0, 17, 18, 25, 35, 45, 55))
  }

  test("roundDuration buckets") {
    val in = Seq(0, 5, 45, 299, 100000)
    val out = in.toDF("d").select(ch.roundDuration(col("d")).as("r")).collect().map(_.getInt(0)).toSeq
    assert(out === Seq(0, 1, 30, 240, 36000))
  }

  test("roundToExp2 rounds down to a power of two") {
    val in = Seq(0L, 1L, 2L, 3L, 1023L, 1024L)
    val out = in.toDF("x").select(ch.roundToExp2(col("x")).as("r")).collect().map(_.getLong(0)).toSeq
    assert(out === Seq(0L, 1L, 2L, 2L, 512L, 1024L))
  }

  test("toYYYYMM composes year*100+month") {
    val r = Seq("2024-03-15").toDF("d")
      .select(ch.toYYYYMM(to_date(col("d"))).as("r")).collect()(0).getInt(0)
    assert(r === 202403)
  }

  test("timeSlot truncates to half-hour") {
    val r = Seq("2024-03-15 10:47:13").toDF("t")
      .select(date_format(ch.timeSlot(to_timestamp(col("t"))), "yyyy-MM-dd HH:mm:ss").as("r"))
      .collect()(0).getString(0)
    assert(r === "2024-03-15 10:30:00")
  }

  test("intDivOrZero guards division by zero") {
    val df = Seq((10, 3), (10, 0)).toDF("a", "b")
      .select(ch.intDivOrZero(col("a"), col("b")).as("r"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(3L, 0L))
  }

  test("intDiv is exact above 2^53 (no divide-through-double)") {
    val big = (1L << 60) + 1L
    val df = Seq((big, 1L), (big, 3L), (-7L, 2L)).toDF("a", "b")
      .select(ch.intDiv(col("a"), col("b")).as("r"))
    // a double round-trip would lose the +1; integral div truncates
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(big, big / 3L, -3L))
  }

  test("appendTrailingCharIfAbsent") {
    val df = Seq("a/", "b").toDF("s")
      .select(ch.appendTrailingCharIfAbsent(col("s"), "/").as("r"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("a/", "b/"))
  }

  test("bar renders proportional width") {
    val df = Seq(0.0, 5.0, 10.0).toDF("x")
      .select(length(ch.bar(col("x"), 0, 10, 10)).as("r"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(0, 5, 10))
  }

  test("domain/domainWithoutWWW byte-scan matches getURLHost semantics") {
    // vectors from the reference's 00398_url_functions.sql plus edges
    // the byte scan must honor (userinfo, port, no-authority, bare host)
    val cases = Seq(
      ("http://paul@www.example.com:80/", "www.example.com", "example.com"),
      ("http:/paul/example/com", "", ""),
      ("http://www.example.com?q=4", "www.example.com", "example.com"),
      ("http://127.0.0.1:443/", "127.0.0.1", "127.0.0.1"),
      ("svn+ssh://example.ru?q=hello%20world", "example.ru", "example.ru"),
      ("//no-scheme.example.com/", "", ""),
      ("www.example.com", "", ""),
      ("http://www.r42.example.org/ref/7", "www.r42.example.org", "r42.example.org"),
      ("http://www./", "www.", "www."), // <=4 bytes after www check: size>4 required
      ("", "", ""))
    val df = cases.map(_._1).toDF("u")
      .select(ch.domain(col("u")).as("d"), ch.domainWithoutWWW(col("u")).as("w"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      cases.map(c => (c._2, c._3)))
  }

  test("dialect registry shadowing is contained to dialect execution") {
    import graft.sql.ChSql
    // inside a dialect query, colliding names resolve CH semantics
    // (hex of an integer = zero-padded byte pairs)
    val inside = ChSql(spark, "SELECT hex(257) AS h").collect()(0).getString(0)
    assert(inside === "0101")
    // afterwards the same session resolves Spark natives again
    val after = spark.sql("SELECT hex(257) AS h").collect()(0).getString(0)
    assert(after === "101")
    // and a shadowed aggregate's registry entry is not ours
    val info = spark.sessionState.functionRegistry
      .lookupFunction(org.apache.spark.sql.catalyst.FunctionIdentifier("sum")).get
    assert(!info.getClassName.startsWith("graft"),
      s"sum left shadowed by ${info.getClassName}")
  }

  test("length is BYTES (reference LengthImpl); lengthUTF8 is chars") {
    val r = sql.ChDdl.execute(spark,
      "SELECT length('привет') AS b, lengthUTF8('привет') AS c, " +
        "length('abc') AS ab, lengthUTF8('abc') AS ac, " +
        "length([1,2,3]) AS arr").get.collect()(0)
    assert(r.getInt(0) === 12) // 6 Cyrillic chars x 2 bytes
    assert(r.getInt(1) === 6)
    assert(r.getInt(2) === 3)
    assert(r.getInt(3) === 3)
    assert(r.getInt(4) === 3)
  }

  test("substring/reverse are BYTE-based; *UTF8 variants are code-point-based") {
    val r = sql.ChDdl.execute(spark,
      "SELECT hex(substring('привет', 1, 2)) AS sb, " +
        "substringUTF8('привет', 1, 2) AS su, " +
        "hex(reverse('пр')) AS rb, reverseUTF8('пр') AS ru, " +
        "substring('abcdef', 3, 2) AS sa, substring('abc', 2) AS s2, " +
        "substring('abc', 9, 2) AS oob, reverse([1,2,3]) AS ra").get
      .collect()(0)
    assert(r.getString(0) === "D0BF") // first 2 BYTES of 'п' (broken char)
    assert(r.getString(1) === "пр")
    assert(r.getString(2) === "80D1BFD0") // byte-reverse of D0BF D180
    assert(r.getString(3) === "рп")
    assert(r.getString(4) === "cd")
    assert(r.getString(5) === "bc")
    assert(r.getString(6) === "")
    assert(r.getSeq[Int](7) === Seq(3, 2, 1))
    // start = 0 raises like the reference (ARGUMENT_OUT_OF_BOUND)
    val e = intercept[Exception] {
      sql.ChDdl.execute(spark, "SELECT substring('abc', 0, 1)").get.collect()
    }
    assert(e.getMessage != null)
  }
}
