package graft.ig

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** PyJson fuzz: on arbitrary nested rows (not just the golden report),
  * the serializer must emit VALID JSON that parses back value-equal to
  * Spark's own view of the data — the golden byte gates pin the Python
  * formatting; this pins structural correctness on adversarial content
  * (quotes, backslashes, control chars, unicode, empty containers,
  * nulls, deep nesting). */
object PyJsonSpec extends Properties("pyjson") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  lazy val spark = graft.Sessions.local("4", "graft-pyjson-test")
  import spark.implicits._
  private val mapper = new ObjectMapper()

  private val nastyString = Gen.oneOf("", "plain", "with \"quotes\"",
    "back\\slash", "new\nline tab\t cr\r", "émoji 🙂 δοκιμή",
    "control", "日本語", "a,b|c", "{\"fake\": 1}")

  private val docGen: Gen[(String, Long, Double, Boolean, Seq[String], Map[String, Long])] =
    for {
      s <- nastyString
      n <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      d <- Gen.oneOf(Gen.chooseNum(-1e6, 1e6), Gen.oneOf(0.0, -0.0, 0.1, 2.4000000000000004))
      b <- Gen.oneOf(true, false)
      arr <- Gen.choose(0, 4).flatMap(k => Gen.listOfN(k, nastyString))
      m <- Gen.choose(0, 6).flatMap(k => Gen.mapOfN(k, Gen.zip(nastyString, Gen.chooseNum(-99L, 99L))))
    } yield (s, n, d, b, arr, m)

  property("serialized rows parse back value-equal (indent and compact)") =
    Prop.forAll(docGen) { case (s, n, d, b, arr, m) =>
      val df = Seq((s, n, d, b, arr, m)).toDF("s", "n", "d", "b", "arr", "m")
        .withColumn("nested", struct(lit(null).cast("string").as("x"), col("d").as("y")))
      val schema = df.schema
      val row = df.queryExecution.executedPlan.executeCollect()(0)
      val pretty = PyJson.renderRow(row, schema, 0, Map.empty)
      val compact = PyJson.renderValueCompact(row, schema, "", Map.empty)
      val (jp, jc) = (mapper.readTree(pretty), mapper.readTree(compact))
      val ok = jp == jc &&
        jp.get("s").asText == s && jp.get("n").asLong == n &&
        jp.get("d").asDouble == d &&
        jp.get("b").asBoolean == b &&
        jp.get("arr").size == arr.length &&
        jp.get("m").size == m.size &&
        jp.get("nested").get("x").isNull &&
        jp.get("nested").get("y").asDouble == d
      if (!ok) println(s"PYJSON MISMATCH input=(${s.take(30)}, $n, $d, $b)\n pretty=$pretty")
      ok
    }
}
