package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** CEP pattern detectors (Siddhi `a -> b within T`, `not b for T`,
  * `#window.time having count`, `#window.session`). */
class PatternsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  // (key, ts_ns, id, type) — two users, hand-computable patterns
  private lazy val events = {
    import spark.implicits._
    Seq(
      // u1: A@10 -> B@15 (first match; B@18 ignored), A@20 -> B@25=boundary
      ("u1", 10L, 1L, "A"), ("u1", 15L, 2L, "B"), ("u1", 18L, 3L, "B"),
      ("u1", 20L, 4L, "A"), ("u1", 25L, 5L, "B"),
      // u2: A@10 with B@16 one past the window (gap 6 > 5) -> absence;
      // C burst: 3 C's within range-5 at ts 30..34, one C far later
      ("u2", 10L, 6L, "A"), ("u2", 16L, 7L, "B"),
      ("u2", 30L, 8L, "C"), ("u2", 32L, 9L, "C"), ("u2", 34L, 10L, "C"),
      ("u2", 100L, 11L, "C"),
    ).toDF("key", "ts", "id", "type")
  }

  test("followedBy picks the FIRST following B within the window (inclusive bound)") {
    val out = Patterns.followedBy(events, "key", "ts", "id", "type", "A", "B", 5L)
      .orderBy("key", "a_id").collect().toSeq
    assert(out == Seq(
      Row("u1", 1L, 2L, 5L),  // first B (id=2, gap 5 == within: inclusive)
      Row("u1", 4L, 5L, 5L)))
  }

  test("conjunction: nearest B either direction, tie -> earlier B, inclusive bound") {
    import spark.implicits._
    val e = Seq(
      // k1: A@10 with B@7 (gap 3) and B@12 (gap 2) -> nearest is AFTER
      ("k1", 7L, 1L, "B"), ("k1", 10L, 2L, "A"), ("k1", 12L, 3L, "B"),
      // k2: A@10 with B@8 and B@12 (both gap 2) -> tie goes to the EARLIER B
      ("k2", 8L, 4L, "B"), ("k2", 10L, 5L, "A"), ("k2", 12L, 6L, "B"),
      // k3: only a backward B exactly at the bound (gap 5 == within: inclusive)
      ("k3", 5L, 7L, "B"), ("k3", 10L, 8L, "A"),
      // k4: B one past the bound in both directions -> no match
      ("k4", 4L, 9L, "B"), ("k4", 10L, 10L, "A"), ("k4", 16L, 11L, "B"),
      // k5: A with no B at all
      ("k5", 10L, 12L, "A"),
    ).toDF("key", "ts", "id", "type")
    val out = Patterns.conjunction(e, "key", "ts", "id", "type", "A", "B", 5L)
      .orderBy("key").collect().toSeq
    assert(out == Seq(
      Row("k1", 2L, 3L, 2L),  // nearest wins regardless of direction
      Row("k2", 5L, 4L, 2L),  // equal gap -> earlier B
      Row("k3", 8L, 7L, 5L))) // inclusive boundary, backward-only
  }

  test("absence keeps A events whose next B is absent or past the window") {
    val out = Patterns.absence(events, "key", "ts", "id", "type", "A", "B", 5L)
      .collect().toSeq
    assert(out == Seq(Row("u2", 6L))) // B@16 is 6 ns later: outside
  }

  test("absence window bound is strict (gap == within still matches B)") {
    val out = Patterns.absence(events, "key", "ts", "id", "type", "A", "B", 6L)
      .collect().toSeq
    assert(out.isEmpty)
  }

  test("burst counts events in the trailing range window per key") {
    val out = Patterns.burst(events, "key", "ts", "id", "type", "C", 5L, 3L)
      .collect().toSeq
    // C@30,32,34 -> counts 1,2,3; only the third fires; C@100 restarts at 1
    assert(out == Seq(Row("u2", 10L, 3L)))
  }

  test("sessionize merges events within the gap and splits on silence") {
    val out = Patterns.sessionize(events, "key", "ts", 5L)
      .orderBy("key", "session_start").collect().toSeq
    assert(out == Seq(
      Row("u1", 10L, 5L),          // 10,15,18,20,25: all gaps <= 5
      Row("u2", 10L, 1L),          // 10 alone (16 is 6 away)
      Row("u2", 16L, 1L),
      Row("u2", 30L, 3L),          // 30,32,34
      Row("u2", 100L, 1L)))
  }

  test("countSequence counts trailing As at each B (RANGE peers included)") {
    val out = Patterns.countSequence(events, "key", "ts", "id", "type", "A", "B", 10L, 1L)
      .orderBy("key", "b_id").collect().toSeq
    assert(out == Seq(
      Row("u1", 2L, 1L),   // B@15: A@10 in [5,15]
      Row("u1", 3L, 1L),   // B@18: A@10 in [8,18]
      Row("u1", 5L, 1L),   // B@25: A@20 (A@10 outside [15,25])
      Row("u2", 7L, 1L)))  // B@16: A@10 in [6,16]
    // minCount=2 filters everything on this fixture
    assert(Patterns.countSequence(events, "key", "ts", "id", "type", "A", "B", 10L, 2L)
      .count() === 0L)
  }

  test("followedBy/absence/conjunction agree with a brute-force oracle on random events") {
    import spark.implicits._
    // deterministic random stream: ts collisions across keys AND within a
    // key (ids break the tie), every (typeA, typeB) role combination
    val rnd = new scala.util.Random(4242)
    val evs = (1L to 400L).map { id =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(60).toLong, id,
        Seq("A", "B", "C")(rnd.nextInt(3)))
    }
    val df = evs.toDF("key", "ts", "id", "type")
    val within = 7L

    case class E(key: String, ts: Long, id: Long, tpe: String)
    val all = evs.map(E.tupled)
    def ord(e: E): (Long, Long) = (e.ts, e.id)
    def firstBAfter(a: E): Option[E] =
      all.filter(e => e.key == a.key && e.tpe == "B" &&
          (ord(e)._1 > a.ts || (ord(e)._1 == a.ts && ord(e)._2 > a.id)))
        .sortBy(ord).headOption
    def lastBBefore(a: E): Option[E] =
      all.filter(e => e.key == a.key && e.tpe == "B" &&
          (ord(e)._1 < a.ts || (ord(e)._1 == a.ts && ord(e)._2 < a.id)))
        .sortBy(ord).lastOption
    val as = all.filter(_.tpe == "A")

    val expFollowed = as.flatMap { a =>
      firstBAfter(a).filter(b => b.ts - a.ts <= within)
        .map(b => (a.key, a.id, b.id, b.ts - a.ts))
    }.toSet
    val gotFollowed = Patterns.followedBy(df, "key", "ts", "id", "type", "A", "B", within)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(gotFollowed === expFollowed)

    val expAbsence = as.filter(a =>
        firstBAfter(a).forall(b => b.ts - a.ts > within))
      .map(a => (a.key, a.id)).toSet
    val gotAbsence = Patterns.absence(df, "key", "ts", "id", "type", "A", "B", within)
      .as[(String, Long)].collect().toSet
    assert(gotAbsence === expAbsence)

    val expConj = as.flatMap { a =>
      val nb = firstBAfter(a).filter(b => b.ts - a.ts <= within)
      val pb = lastBBefore(a).filter(b => a.ts - b.ts <= within)
      (nb, pb) match {
        case (None, None) => None
        case (Some(b), None) => Some((a.key, a.id, b.id, b.ts - a.ts))
        case (None, Some(b)) => Some((a.key, a.id, b.id, a.ts - b.ts))
        case (Some(n), Some(p)) =>
          // operator contract: prev wins ties (gapP <= gapN)
          if (a.ts - p.ts <= n.ts - a.ts) Some((a.key, a.id, p.id, a.ts - p.ts))
          else Some((a.key, a.id, n.id, n.ts - a.ts))
      }
    }.toSet
    val gotConj = Patterns.conjunction(df, "key", "ts", "id", "type", "A", "B", within)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(gotConj === expConj)

    // countSequence: RANGE-frame semantics — peers at the same ts count
    // regardless of id order
    val expCount = all.filter(_.tpe == "B").map { b =>
      val cnt = all.count(a => a.key == b.key && a.tpe == "A" &&
        a.ts >= b.ts - within && a.ts <= b.ts).toLong
      (b.key, b.id, cnt)
    }.filter(_._3 >= 2L).toSet
    val gotCount = Patterns.countSequence(df, "key", "ts", "id", "type", "A", "B", within, 2L)
      .as[(String, Long, Long)].collect().toSet
    assert(gotCount === expCount)

    assert(gotFollowed.nonEmpty && gotAbsence.nonEmpty && gotConj.nonEmpty &&
      gotCount.nonEmpty)
  }

  test("chain picks first B after A, then first C after that B, whole chain within T") {
    import spark.implicits._
    val e = Seq(
      // k1: A@10 -> B@12 (first B) -> C@14; C@11 (before B) must NOT bind
      ("k1", 10L, 1L, "A"), ("k1", 11L, 2L, "C"), ("k1", 12L, 3L, "B"),
      ("k1", 14L, 4L, "C"),
      // k2: A@10 -> B@12, but the only C lands past the horizon (20 > 10+8)
      //     -> no match; the second B can never rescue the chain (any C
      //     after it is also after the first B, same whole-chain bound)
      ("k2", 10L, 5L, "A"), ("k2", 12L, 6L, "B"), ("k2", 15L, 7L, "B"),
      ("k2", 20L, 9L, "C"),
      // k3: chain completes exactly at the bound (C at ts 18 == 10+8)
      ("k3", 10L, 10L, "A"), ("k3", 14L, 11L, "B"), ("k3", 18L, 12L, "C"),
      // k4: B and C at the same ts as A's B — id order decides "after"
      ("k4", 10L, 13L, "A"), ("k4", 12L, 14L, "B"), ("k4", 12L, 15L, "C"),
    ).toDF("key", "ts", "id", "type")
    val out = Patterns.chain(e, "key", "ts", "id", "type", "A", "B", "C", 8L)
      .orderBy("key").collect().toSeq
    assert(out == Seq(
      Row("k1", 1L, 3L, 4L, 4L),
      Row("k3", 10L, 11L, 12L, 8L),   // inclusive bound
      Row("k4", 13L, 14L, 15L, 2L)))  // same-ts C after B via id tie-break
  }

  test("chain matches a brute-force oracle on random events") {
    import spark.implicits._
    val rnd = new scala.util.Random(2121)
    val evs = (1L to 500L).map { id =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(60).toLong, id,
        Seq("A", "B", "C", "D")(rnd.nextInt(4)))
    }
    val df = evs.toDF("key", "ts", "id", "type")
    val within = 9L
    case class E(key: String, ts: Long, id: Long, tpe: String)
    val all = evs.map(E.tupled)
    def ord(e: E): (Long, Long) = (e.ts, e.id)
    def firstAfter(base: E, key: String, tpe: String): Option[E] =
      all.filter(e => e.key == key && e.tpe == tpe &&
          (e.ts > base.ts || (e.ts == base.ts && e.id > base.id)))
        .sortBy(ord).headOption
    val exp = all.filter(_.tpe == "A").flatMap { a =>
      for {
        b <- firstAfter(a, a.key, "B")
        c <- firstAfter(b, a.key, "C") if c.ts - a.ts <= within
      } yield (a.key, a.id, b.id, c.id, c.ts - a.ts)
    }.toSet
    val got = Patterns.chain(df, "key", "ts", "id", "type", "A", "B", "C", within)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(exp.nonEmpty && got === exp)
    // single keyed exchange: both window passes share one shuffle + sort
    val plan = Patterns.chain(df, "key", "ts", "id", "type", "A", "B", "C", within)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 === 1, plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("guardedFollowedBy picks the first B satisfying the cross-binding guard") {
    import spark.implicits._
    val e = Seq(
      // k1: A(v=10)@10 -> B(v=5)@12 fails guard, B(v=20)@14 binds (not the
      //     unguarded first B!)
      ("k1", 10L, 1L, "A", 10.0), ("k1", 12L, 2L, "B", 5.0), ("k1", 14L, 3L, "B", 20.0),
      // k2: only B fails the guard -> no match
      ("k2", 10L, 4L, "A", 10.0), ("k2", 12L, 5L, "B", 10.0),
      // k3: guard ok but outside the horizon
      ("k3", 10L, 6L, "A", 1.0), ("k3", 20L, 7L, "B", 2.0),
    ).toDF("key", "ts", "id", "type", "value")
    val out = Patterns.guardedFollowedBy(e, "key", "ts", "id", "type", "value",
      "A", "B", 5L, (av, bv) => bv > av).collect().toSeq
    assert(out === Seq(Row("k1", 1L, 3L, 10.0, 4L)))
  }

  test("guardedFollowedBy matches a brute-force oracle on random valued events") {
    import spark.implicits._
    val rnd = new scala.util.Random(5151)
    val evs = (1L to 400L).map { id =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(60).toLong, id,
        Seq("A", "B")(rnd.nextInt(2)), rnd.nextInt(50).toDouble)
    }
    val df = evs.toDF("key", "ts", "id", "type", "value")
    val within = 8L
    case class E(key: String, ts: Long, id: Long, tpe: String, v: Double)
    val all = evs.map(E.tupled)
    val exp = all.filter(_.tpe == "A").flatMap { a =>
      all.filter(e => e.key == a.key && e.tpe == "B" && e.v > a.v &&
          (e.ts > a.ts || (e.ts == a.ts && e.id > a.id)) && e.ts - a.ts <= within)
        .sortBy(e => (e.ts, e.id)).headOption
        .map(b => (a.key, a.id, b.id, a.v, b.ts - a.ts))
    }.toSet
    val got = Patterns.guardedFollowedBy(df, "key", "ts", "id", "type", "value",
      "A", "B", within, (av, bv) => bv > av)
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(exp.nonEmpty && got === exp)
  }

  test("guardedFollowedBy hot key: pairs bounded by the band neighborhood, not |A|·|B|") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    // ONE key owns the whole stream — the regime where a plain key join
    // degenerates to |A|·|B|. 400 As + 400 Bs spread over ~40 band
    // widths: the band equi-join must (a) still be correct, (b) duplicate
    // the B side into EXACTLY two bands each (the 2·within bound), and
    // (c) carry _band in the join keys so pairing stays per-neighborhood.
    val rnd = new scala.util.Random(777)
    val within = 100L
    val evs = (1L to 800L).map { id =>
      ("hot", rnd.nextInt(4000).toLong, id,
        if (id % 2 == 0) "A" else "B", rnd.nextInt(50).toDouble)
    }
    val df = evs.toDF("key", "ts", "id", "type", "value")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // static plan: metrics readable per node
    try {
      val out = Patterns.guardedFollowedBy(df, "key", "ts", "id", "type", "value",
        "A", "B", within, (av, bv) => bv > av)
        .as[(String, Long, Long, Double, Long)]
      val got = out.collect().toSet
      case class E(key: String, ts: Long, id: Long, tpe: String, v: Double)
      val all = evs.map(E.tupled)
      val exp = all.filter(_.tpe == "A").flatMap { a =>
        all.filter(e => e.tpe == "B" && e.v > a.v &&
            (e.ts > a.ts || (e.ts == a.ts && e.id > a.id)) && e.ts - a.ts <= within)
          .sortBy(e => (e.ts, e.id)).headOption
          .map(b => (a.key, a.id, b.id, a.v, b.ts - a.ts))
      }.toSet
      assert(exp.nonEmpty && got === exp)
      def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
      val plan = out.queryExecution.executedPlan
      // (b) the explode emitted each B into exactly 2 bands — the ENTIRE
      // hot-key blow-up the design permits
      val gens = nodes(plan).filter(_.getClass.getSimpleName == "GenerateExec")
      assert(gens.nonEmpty, plan.toString)
      val bCount = evs.count(_._4 == "B").toLong
      assert(gens.map(_.metrics("numOutputRows").value).sum === 2L * bCount)
      // (c) the join is keyed on (_k, _band), never _k alone
      val joinLine = plan.toString.linesIterator
        .find(l => l.contains("Join") && l.contains("_band"))
      assert(joinLine.nonEmpty, plan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("lengthWindow: trailing n-event count/sum, ramp-up at key start, exact decimals") {
    import spark.implicits._
    val e = Seq(
      ("k1", 10L, 1L, 0.1), ("k1", 20L, 2L, 0.2), ("k1", 30L, 3L, 0.3),
      ("k1", 40L, 4L, 0.4),
      ("k2", 10L, 5L, 1.5),
    ).toDF("key", "ts", "id", "value")
    val out = Patterns.lengthWindow(e, "key", "ts", "id", "value", 3)
      .orderBy("key", "id").collect().toSeq
    assert(out === Seq(
      Row("k1", 1L, 1L, 0.1),
      Row("k1", 2L, 2L, 0.3),                 // 0.1+0.2 exact via decimal
      Row("k1", 3L, 3L, 0.6),
      Row("k1", 4L, 3L, 0.9),                 // window slid: 0.2+0.3+0.4
      Row("k2", 5L, 1L, 1.5)))
  }

  test("lengthBatch: tumbling count batches, partial batch withheld, order by (ts, id)") {
    import spark.implicits._
    val e = Seq(
      ("k1", 10L, 9L, 0.1), ("k1", 20L, 2L, 0.2), ("k1", 30L, 3L, 0.3),
      ("k1", 40L, 4L, 0.4), ("k1", 50L, 5L, 0.5), ("k1", 60L, 6L, 0.6),
      ("k1", 70L, 7L, 0.7), // trailing partial: withheld
      ("k2", 10L, 8L, 1.0), ("k2", 20L, 1L, 2.0), ("k2", 30L, 0L, 4.0),
    ).toDF("key", "ts", "id", "value")
    val out = Patterns.lengthBatch(e, "key", "ts", "id", "value", 3)
      .orderBy("key", "batch_no").collect().toSeq
    assert(out === Seq(
      // first/last follow (ts, id) order, NOT id order (k1 batch 0 starts
      // at id 9; k2's ids descend with ts)
      Row("k1", 0L, 0.6, 9L, 3L),
      Row("k1", 1L, 1.5, 4L, 6L),
      Row("k2", 0L, 7.0, 8L, 0L)))
  }

  test("outputFirstEvery keeps the first event per key per tumbling bucket") {
    import spark.implicits._
    val e = Seq(
      ("k1", 0L, 1L), ("k1", 3L, 2L), ("k1", 9L, 3L),    // bucket 0: first id=1
      ("k1", 10L, 4L), ("k1", 12L, 5L),                  // bucket 1: first id=4
      ("k1", 31L, 6L),                                   // bucket 3: alone
      ("k2", 5L, 7L), ("k2", 5L, 8L),                    // same ts: id breaks tie
    ).toDF("key", "ts", "id")
    val out = Patterns.outputFirstEvery(e, "key", "ts", "id", 10L)
      .orderBy("key", "bucket_start").collect().toSeq
    assert(out === Seq(
      Row("k1", 1L, 0L), Row("k1", 4L, 10L), Row("k1", 6L, 30L),
      Row("k2", 7L, 0L)))
  }

  test("rate-limit buckets use floor semantics for negative timestamps (streaming parity)") {
    import spark.implicits._
    // SQL `div` truncates toward zero: -11 div 10 = -1, but the streaming
    // twins' Math.floorDiv(-11, 10) = -2 — the batch path must agree
    val e = Seq(("k", -11L, 3L), ("k", -10L, 2L), ("k", -1L, 1L), ("k", 0L, 4L))
      .toDF("key", "ts", "id")
    val out = Patterns.outputFirstEvery(e, "key", "ts", "id", 10L)
      .orderBy("bucket_start").collect().toSeq
    assert(out === Seq(
      Row("k", 3L, -20L),   // floor bucket -2, not truncated -1
      Row("k", 2L, -10L),   // -10 and -1 share bucket -1; first by ts is id=2
      Row("k", 4L, 0L)))
    val last = Patterns.outputLastEvery(e, "key", "ts", "id", 10L)
      .orderBy("bucket_start").collect().toSeq
    assert(last === Seq(Row("k", 3L, -20L), Row("k", 1L, -10L), Row("k", 4L, 0L)))
  }

  test("disjunction tags the arrived branch; same-type binds the first branch only") {
    val out = Patterns.disjunction(events, "key", "id", "type", "A", "B")
      .orderBy(coalesce(col("a_id"), col("b_id"))).collect().toSeq
    assert(out === Seq(
      Row("u1", 1L, null), Row("u1", null, 2L), Row("u1", null, 3L),
      Row("u1", 4L, null), Row("u1", null, 5L),
      Row("u2", 6L, null), Row("u2", null, 7L)))
    // typeA == typeB: left-to-right branch preference -> a_id binds, b_id never
    val same = Patterns.disjunction(events, "key", "id", "type", "B", "B").collect().toSeq
    assert(same.length === 4) // B ids 2,3,5,7
    assert(same.forall(r => !r.isNullAt(1) && r.isNullAt(2)))
    // zero-exchange plan: disjunction is a pure scan-stage projection
    val plan = Patterns.disjunction(events, "key", "id", "type", "A", "B")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("self-conjunction (typeA == typeB) matches the brute-force oracle, no double emit") {
    import spark.implicits._
    // pins the batch twin to the same contract the streaming side fixed in
    // round 4 (finalized As retained as B-context must not re-emit)
    val rnd = new scala.util.Random(77)
    val evs = (1L to 300L).map { id =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(50).toLong, id, Seq("B", "C")(rnd.nextInt(2)))
    }
    val df = evs.toDF("key", "ts", "id", "type")
    val within = 6L
    case class E(key: String, ts: Long, id: Long, tpe: String)
    val bs = evs.map(E.tupled).filter(_.tpe == "B")
    def ord(e: E): (Long, Long) = (e.ts, e.id)
    val exp = bs.flatMap { a =>
      val nb = bs.filter(e => e.key == a.key &&
          (e.ts > a.ts || (e.ts == a.ts && e.id > a.id)))
        .sortBy(ord).headOption.filter(b => b.ts - a.ts <= within)
      val pb = bs.filter(e => e.key == a.key &&
          (e.ts < a.ts || (e.ts == a.ts && e.id < a.id)))
        .sortBy(ord).lastOption.filter(b => a.ts - b.ts <= within)
      (nb, pb) match {
        case (None, None) => None
        case (Some(b), None) => Some((a.key, a.id, b.id, b.ts - a.ts))
        case (None, Some(b)) => Some((a.key, a.id, b.id, a.ts - b.ts))
        case (Some(n), Some(p)) =>
          if (a.ts - p.ts <= n.ts - a.ts) Some((a.key, a.id, p.id, a.ts - p.ts))
          else Some((a.key, a.id, n.id, n.ts - a.ts))
      }
    }
    val got = Patterns.conjunction(df, "key", "ts", "id", "type", "B", "B", within)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.size === got.toSet.size) // each B emits at most once
    assert(exp.nonEmpty && got.toSet === exp.toSet)
  }

  test("sf0.001 pattern queries are plan-sane (single key exchange, no global window)") {
    val df = Patterns.followedBy(
      graft.Tables.events(spark, sf()), "user_id", "ts_ns", "event_id",
      "event_type", "signup", "purchase", 12L * 3600 * 1000000000L)
    val plan = df.queryExecution.executedPlan.toString
    // the window must be partitioned by user_id — never a single-partition sort
    assert(!plan.contains("SinglePartition"), plan)
    assert(df.count() > 0)
  }

  test("sortWindow holds the n best by (value, id); ties broken by id; short keys keep all") {
    import spark.implicits._
    val df = Seq(
      ("u1", 1L, 5.0), ("u1", 2L, 1.0), ("u1", 3L, 3.0), ("u1", 4L, 1.0),
      ("u2", 5L, 9.0)).toDF("key", "id", "value")
    val got = Patterns.sortWindow(df, "key", "id", "value", 3)
      .orderBy("key", "rk").as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("u1", 1L, 2L, 1.0), ("u1", 2L, 4L, 1.0), ("u1", 3L, 3L, 3.0),
      ("u2", 1L, 5L, 9.0)))
  }

  test("timeLengthWindow: doubly-bounded window matches a brute-force oracle") {
    import spark.implicits._
    // span 100µs, count 3; values = id for easy sums
    val evs = Seq(
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 90L, 3L), (1L, 120L, 4L),
      (1L, 130L, 5L), (1L, 400L, 6L), (2L, 0L, 7L))
    val df = evs.toDF("key", "ts", "id").withColumn("value", col("id").cast("double"))
    val got = Patterns.timeLengthWindow(df, "key", "ts", "id", "value", 100L, 3)
      .orderBy("key", "id").as[(Long, Long, Long, Double)].collect().toSeq
    // brute force: per event, the last min(3, within (ts-100, ts]) events
    val want = evs.map { case (k, ts, id) =>
      val win = evs.filter(e => e._1 == k && e._2 > ts - 100 &&
        (e._2 < ts || (e._2 == ts && e._3 <= id)))
        .sortBy(e => (e._2, e._3)).takeRight(3)
      (k, id, win.size.toLong, win.map(_._3.toDouble).sum)
    }.sortBy(e => (e._1, e._2))
    assert(got === want)
    // spot checks: id=4 at ts=120 sees {2(50),3(90),4(120)} -> cnt 3 sum 9;
    // id=6 at ts=400 is alone in its span -> cnt 1 sum 6
    assert(got.find(_._2 == 4L).get === ((1L, 4L, 3L, 9.0)))
    assert(got.find(_._2 == 6L).get === ((1L, 6L, 1L, 6.0)))
  }

  test("timeLengthWindow: self-join route (n past the lag-chain bound) matches the same oracle") {
    import spark.implicits._
    // n = 70 > TimeLengthMaxLagChain forces the (key, rn) self-join route
    // (r17: small n resolves through an element_at(lag-array) back-
    // reference instead); same brute-force oracle as the small-n test,
    // with both bounds exercised — span 800 admits up to 80 of key 1's
    // 10µs-spaced events, the count cap trims that to 70, and early rows
    // are rn-capped
    val n = 70
    val evs = (1 to 90).map(i => (1L, i.toLong * 10, i.toLong)) ++
      (1 to 5).map(i => (2L, i.toLong * 500, (100 + i).toLong))
    val df = evs.toDF("key", "ts", "id").withColumn("value", col("id").cast("double"))
    val got = Patterns.timeLengthWindow(df, "key", "ts", "id", "value", 800L, n)
      .orderBy("key", "id").as[(Long, Long, Long, Double)].collect().toSeq
    val want = evs.map { case (k, ts, id) =>
      val win = evs.filter(e => e._1 == k && e._2 > ts - 800 &&
        (e._2 < ts || (e._2 == ts && e._3 <= id)))
        .sortBy(e => (e._2, e._3)).takeRight(n)
      (k, id, win.size.toLong, win.map(_._3.toDouble).sum)
    }.sortBy(e => (e._1, e._2))
    assert(got === want)
  }

  test("delayWindow: released set is the ts' <= ts - T cut, tie-safe, dark at start") {
    import spark.implicits._
    // T = 100µs; two events share ts=100 (both see only ts=0's release)
    val evs = Seq(
      (1L, 0L, 1L, 2.0), (1L, 100L, 2L, 3.0), (1L, 100L, 3L, 4.0),
      (1L, 150L, 4L, 5.0), (1L, 250L, 5L, 6.0), (2L, 0L, 6L, 7.0))
    val df = evs.toDF("key", "ts", "id", "value")
    val got = Patterns.delayWindow(df, "key", "ts", "id", "value", 100L)
      .orderBy("key", "id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 0L, 0.0),        // nothing released yet
      (1L, 2L, 1L, 2.0),        // ts=0 released exactly at 100
      (1L, 3L, 1L, 2.0),        // tie on ts sees the same cut
      (1L, 4L, 1L, 2.0),        // 100-ts events release only at 200
      (1L, 5L, 4L, 14.0),       // 0, 100, 100 and (exactly at 250) 150
      (2L, 6L, 0L, 0.0)))
  }

  test("lossyFrequent keeps exactly the attrs clearing the support cross-multiply") {
    import spark.implicits._
    // u1: a=3, b=2, c=1 of 6 -> support 1/3 (334 milli) keeps only a
    //     (b: 2000 < 334*6 = 2004; boundary intentionally knife-edge)
    val df = Seq(
      "u1" -> "a", "u1" -> "a", "u1" -> "a", "u1" -> "b", "u1" -> "b",
      "u1" -> "c", "u2" -> "x").toDF("key", "type")
    val got = Patterns.lossyFrequent(df, "key", "type", 334L)
      .orderBy("key", "type").as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(("u1", "a", 3L, 6L), ("u2", "x", 1L, 1L)))
    // at exactly 1/3 (333.33... -> 333 milli) b's 2*1000 >= 333*6 holds
    val loose = Patterns.lossyFrequent(df, "key", "type", 333L)
      .orderBy("key", "type").as[(String, String, Long, Long)].collect().toSeq
    assert(loose === Seq(
      ("u1", "a", 3L, 6L), ("u1", "b", 2L, 6L), ("u2", "x", 1L, 1L)))
  }

  test("round-9 operators refuse nonsense arguments loudly (never a silent wrong answer)") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, 1.0)).toDF("key", "ts", "id", "value")
    intercept[IllegalArgumentException](
      Patterns.delayWindow(df, "key", "ts", "id", "value", 0L))
    intercept[IllegalArgumentException](
      Patterns.lossyFrequent(df, "key", "key", 0L))
    intercept[IllegalArgumentException](
      Patterns.lossyFrequent(df, "key", "key", 1001L))
    intercept[IllegalArgumentException](
      graft.functions.Similarity.activityCosineTopK(df, "key", "ts", 0L, col("key") < 2, 3))
    val docs = Seq((1L, "text")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      graft.functions.Dedup.lineDedup(docs, minDocs = 1))
    intercept[IllegalArgumentException](
      graft.functions.Dedup.duplicateSpanScrub(docs, 0, 2L))
  }

  test("frequentTypes is the exact top-k by count with (cnt desc, value asc) ties") {
    import spark.implicits._
    val df = Seq(
      "u1" -> "a", "u1" -> "a", "u1" -> "b", "u1" -> "b", "u1" -> "c",
      "u2" -> "x").toDF("key", "type")
    val got = Patterns.frequentTypes(df, "key", "type", 2)
      .orderBy("key", "rk").as[(String, Long, String, Long)].collect().toSeq
    // u1: a and b both count 2 -> 'a' wins rank 1 lexicographically; c cut
    assert(got === Seq(
      ("u1", 1L, "a", 2L), ("u1", 2L, "b", 2L), ("u2", 1L, "x", 1L)))
  }
}
