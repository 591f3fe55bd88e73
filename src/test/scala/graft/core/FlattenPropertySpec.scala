package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

/** Property tests over the flatten/coercion kernel (O4–O8): invariants
  * that must hold for ANY envelope batch, per SURVEY §5. */
class FlattenPropertySpec extends SparkSpec {

  /** Deterministic property driver (no scalatest-scalacheck bridge in the
    * offline cache): N samples from the generator with fixed seeds. */
  private def forAll[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default.withSize(4 + i * 3), Seed(i.toLong)))
    }

  private val rowSchema = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("n", IntegerType)))

  private case class Ev(op: String, before: Option[(String, String, Int)],
                        after: Option[(String, String, Int)], srcTs: Long, ts: Long)

  private val genImage: Gen[(String, String, Int)] = for {
    id <- Gen.alphaNumStr.map(_.take(8))
    name <- Gen.alphaNumStr.map(_.take(12))
    n <- Arbitrary.arbitrary[Int]
  } yield (id, name, n)

  private val genEv: Gen[Ev] = for {
    op <- Gen.oneOf("c", "u", "d", "r")
    img <- genImage
    img2 <- genImage
    srcTs <- Gen.choose(0L, 1L << 40)
    ts <- Gen.choose(0L, 1L << 40)
  } yield op match {
    case "c" | "r" => Ev(op, None, Some(img), srcTs, ts)
    case "u" => Ev(op, Some(img), Some(img2), srcTs, ts)
    case "d" => Ev(op, Some(img), None, srcTs, ts)
  }

  private def toDf(evs: List[Ev]) = {
    def img(o: Option[(String, String, Int)]): Row =
      o.map { case (a, b, c) => Row(a, b, c) }.orNull
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        evs.map(e => Row(e.op, img(e.before), img(e.after), Row(e.srcTs), e.ts)), 2),
      ChangeEnvelope.schema(rowSchema))
  }

  test("multi-op flatten: row count = events with op in {c,u,d}; r always dropped") {
    forAll(Gen.listOf(genEv)) { evs =>
      val out = ChangeEnvelope.flatten(toDf(evs), rowSchema, "insert,update,delete")
      assert(out.count() === evs.count(e => e.op != "r"))
    }
  }

  test("multi-op flatten: padded columns never null, padding only where image absent") {
    forAll(Gen.listOf(genEv)) { evs =>
      val out = ChangeEnvelope.flatten(toDf(evs), rowSchema, "insert,update,delete").collect()
      out.foreach { r =>
        r.getString(r.fieldIndex("_op")) match {
          case "insert" =>
            assert(r.getString(r.fieldIndex("before_id")) === "") // padded
            assert(r.getInt(r.fieldIndex("before_n")) === 0)
          case "delete" =>
            assert(r.getString(r.fieldIndex("id")) === "")
            assert(r.getInt(r.fieldIndex("n")) === 0)
          case "update" => // both images real: nothing padded
        }
      }
    }
  }

  test("single-op flatten: exact payload round-trip for each op") {
    forAll(Gen.listOf(genEv)) { evs =>
      val df = toDf(evs)
      val ins = ChangeEnvelope.flatten(df, rowSchema, "insert").collect()
      val expectedIns = evs.filter(_.op == "c").map(_.after.get).toSet
      assert(ins.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet === expectedIns)
      val del = ChangeEnvelope.flatten(df, rowSchema, "delete").collect()
      val expectedDel = evs.filter(_.op == "d").map(_.before.get).toSet
      assert(del.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet === expectedDel)
    }
  }

  test("transport properties always carry the op name and timestamps") {
    forAll(Gen.listOf(genEv)) { evs =>
      val out = ChangeEnvelope.flatten(toDf(evs), rowSchema, "insert,update,delete").collect()
      val byTs = evs.map(e => (e.ts, e.srcTs)).toMap
      out.foreach { r =>
        assert(Set("insert", "update", "delete").contains(r.getString(r.fieldIndex("_op"))))
        assert(byTs(r.getLong(r.fieldIndex("_ts_ms"))) === r.getLong(r.fieldIndex("_source_ts_ms")))
      }
    }
  }

  test("normalize is idempotent and type-stable") {
    val schema = StructType(Seq(
      StructField("sh", ShortType), StructField("d0", DecimalType(12, 0)),
      StructField("d3", DecimalType(12, 3)), StructField("s", StringType)))
    forAll(Gen.listOf(for {
      sh <- Arbitrary.arbitrary[Short]
      l <- Gen.choose(-1000000L, 1000000L)
      d <- Gen.choose(-1000.0, 1000.0)
      s <- Gen.alphaNumStr.map(_.take(6))
    } yield (sh, l, d, s))) { rows =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (sh, l, d, s) =>
          Row(sh, new java.math.BigDecimal(l), new java.math.BigDecimal(d).setScale(3,
            java.math.RoundingMode.HALF_UP), s)
        }), schema)
      val once = ChangeEnvelope.normalize(df)
      val twice = ChangeEnvelope.normalize(once)
      assert(once.schema === twice.schema)
      assert(once.schema.fields.map(_.dataType).toSeq ===
        Seq(IntegerType, LongType, DoubleType, StringType))
      assert(once.collect().toSeq === twice.collect().toSeq)
    }
  }
}
