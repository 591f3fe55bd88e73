package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.parsePriorQueries must read the prior-round artifact in every
  * shape it actually occurs in — the ADVICE r08 finding was that rounds
  * 1-8 all recorded `"prior":null` because the old token-match only
  * understood the compact line Bench itself emits, while the committed
  * artifacts are driver wrappers (pretty-printed `parsed`, JSON-escaped
  * `tail`), so the >3x deviation guard was dead code. */
class BenchPriorSpec extends AnyFunSuite {

  test("shape 1: the raw one-line JSON Bench emits") {
    val raw =
      """{"metric":"total","value":12.5,"unit":"sec","queries":{"q1_op_filter":0.457,"p4_fingerprint":1.0046},"sf":"/root/testdata/sf0.1","sentinel":[0.288],"contended_passes":[],"prior":null,"deviant_vs_prior":{}}"""
    val got = Bench.parsePriorQueries(raw)
    assert(got === Some(Map("q1_op_filter" -> 0.457, "p4_fingerprint" -> 1.0046)))
  }

  test("shape 2: driver wrapper with pretty-printed parsed and escaped tail") {
    // exactly the BENCH_r08.json layout: queries appear BOTH escaped in
    // "tail" and as a real object under "parsed"; parsed must win and
    // wrapper metadata (n, cpus, value) must never leak in as queries
    val wrapper =
      """{
        |  "n": 8,
        |  "rc": 0,
        |  "cpus": 32,
        |  "sf": 0.1,
        |  "tail": "some log line\n{\"metric\":\"total\",\"value\":111.8,\"unit\":\"sec\",\"queries\":{\"q1_op_filter\":0.457,\"q12_dedup\":4.7997},\"sf\":\"/root/testdata/sf0.1\"}\n[success] Total time: 710 s\n",
        |  "parsed": {
        |    "metric": "total",
        |    "value": 111.8,
        |    "unit": "sec",
        |    "queries": {
        |      "q1_op_filter": 0.457,
        |      "q12_dedup": 4.7997
        |    },
        |    "sf": "/root/testdata/sf0.1"
        |  }
        |}""".stripMargin
    val got = Bench.parsePriorQueries(wrapper)
    assert(got === Some(Map("q1_op_filter" -> 0.457, "q12_dedup" -> 4.7997)))
  }

  test("shape 3: wrapper with parsed:null and a tail truncated mid-line (BENCH_r07)") {
    // r07's tail drops the head of the emitted line (starts mid-value)
    // and is cut before the closing brace; every intact pair must still
    // be salvaged so at least a partial prior baseline exists
    val wrapper =
      """{
        |  "n": 7,
        |  "rc": 0,
        |  "cpus": 32,
        |  "sf": 0.1,
        |  "tail": ":1.8274,\"p11_media_meta\":0.2945,\"q11_delete_apply\":0.2901,\"q12_dedup\":0.3859,\"""".stripMargin + "\",\n  \"parsed\": null\n}"
    val got = Bench.parsePriorQueries(wrapper)
    assert(got === Some(Map(
      "p11_media_meta" -> 0.2945,
      "q11_delete_apply" -> 0.2901,
      "q12_dedup" -> 0.3859)))
  }

  test("shape 3 with queries_min (round 12+): salvage resolves each query to its MEDIAN") {
    // bench_named now carries min-of-samples BEFORE the median map; the
    // text salvage keeps the LAST occurrence per name, which must be the
    // median — a prior baseline built from minima would make every
    // contention-slowed current run look deviant
    val tail = """{"metric":"bench_named","queries_min":{"q12_dedup":0.21,""" +
      """"p11_media_meta":0.18},"queries":{"q12_dedup":0.39,"p11_media_meta":0.29}}"""
    val wrapper = s"""{"n":12,"rc":0,"tail":${"\"" + tail.replace("\"", "\\\"") + "\""},"parsed":null}"""
    val got = Bench.parsePriorQueries(wrapper)
    assert(got === Some(Map("q12_dedup" -> 0.39, "p11_media_meta" -> 0.29)))
  }

  test("shape 4 (round 11+): short-keyed final line expands through the registry; sent is read") {
    // the committed-artifact fix: the final line carries SHORT keys
    // ("q1", "p54") so 92 queries fit the wrapper's 2,000-byte tail cap,
    // plus the run's median sentinel for cross-round normalization
    val raw =
      """{"metric":"total","value":12.5,"unit":"sec","sf":"/root/testdata/sf0.1","sent":0.210,"queries":{"q1":0.46,"q12":4.80,"p4":1.00},"contaminated_queries":[]}"""
    val got = Bench.parsePriorQueries(raw)
    assert(got === Some(Map(
      "q1_op_filter" -> 0.46, "q12_dedup" -> 4.80, "p4_fingerprint" -> 1.00)))
    assert(Bench.parsePriorSentinel(raw) === Some(0.210))
    // wrapper shape with the short line escaped in the tail
    val wrapper =
      """{"n": 11, "parsed": null, "tail": "noise\n{\"metric\":\"total\",\"value\":12.5,\"unit\":\"sec\",\"sf\":\"x\",\"sent\":0.19,\"queries\":{\"q1\":0.46,\"p4\":1.0}}\n"}"""
    assert(Bench.parsePriorQueries(wrapper) ===
      Some(Map("q1_op_filter" -> 0.46, "p4_fingerprint" -> 1.0)))
    assert(Bench.parsePriorSentinel(wrapper) === Some(0.19))
    // a short key that resolves to no registered query is dropped, never guessed
    assert(Bench.parsePriorQueries("""{"queries":{"q999":1.0,"q1":0.5}}""") ===
      Some(Map("q1_op_filter" -> 0.5)))
  }

  test("the final short line for the full registry fits the 2,000-byte committed tail cap") {
    // every registry entry at a worst-plausible width (3-digit seconds,
    // 2 decimals) plus the fixed fields — the exact string emit() builds,
    // under the WORST contamination case: every query contaminated, the
    // final-line list capped at ContamCap entries (the full list lives on
    // the diag line; pre-cap, 92 entries at ~7 bytes each would have
    // pushed the one tail-protected line past the cap with no second
    // printed copy to salvage)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val qs = names.map(n => "\"" + Bench.shortKey(n) + "\":999.99")
      .mkString("{", ",", "}")
    val contam = names.take(Bench.ContamCap)
      .map(n => "\"" + Bench.shortKey(n) + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":99999.99,"unit":"sec","sf":"/root/testdata/sf0.1","sent":0.210,"io_sent":99.999,"queries":$qs,"contaminated_n":${names.size},"contaminated_queries":$contam}"""
    assert(line.getBytes("UTF-8").length <= 1700,
      s"short final line must stay comfortably under the 2,000-byte tail cap, got ${line.length}")
    // short keys are unique across the registry (expansion is injective)
    val keys = names.map(Bench.shortKey)
    assert(keys.distinct.size === keys.size, s"short-key collision in $keys")
  }

  test("deviance normalization: a uniform machine slowdown is absorbed by the sentinel ratio") {
    val prior = Map("q1_op_filter" -> 1.0, "q2_before_after" -> 0.5,
      "q3_initial_offset" -> 0.04) // under the 0.05 s jitter floor
    // this run: machine 3.5x slower across the board (sentinel ratio
    // carries the same 3.5) — NOTHING may be flagged, though every raw
    // ratio exceeds 3x
    val uniform = Seq("q1_op_filter" -> 3.5, "q2_before_after" -> 1.75)
    assert(Bench.deviantVsPrior(uniform, prior, 3.5) === Seq.empty)
    // unnormalized (scale 1.0) the same numbers DO trip the flag, with
    // the raw ratio reported — the pre-sentinel behavior, pinned so the
    // normalization is provably doing the work
    assert(Bench.deviantVsPrior(uniform, prior, 1.0).toMap ===
      Map("q1_op_filter" -> 3.5, "q2_before_after" -> 3.5))
    // one query genuinely 4x slower ON TOP of a 2x machine slowdown is
    // still flagged, at its machine-corrected ratio
    val mixed = Seq("q1_op_filter" -> 8.0, "q2_before_after" -> 1.0)
    assert(Bench.deviantVsPrior(mixed, prior, 2.0).toMap === Map("q1_op_filter" -> 4.0))
    // speed-ups past 3x are flagged too (ratio < 1/3)
    val fast = Bench.deviantVsPrior(Seq("q1_op_filter" -> 0.2), prior, 1.0)
    assert(fast.map(_._1) === Seq("q1_op_filter"))
    assert(math.abs(fast.head._2 - 0.2) < 1e-9)
    // sub-jitter prior queries and failed runs (v < 0) never flag
    assert(Bench.deviantVsPrior(
      Seq("q3_initial_offset" -> 1.0, "q1_op_filter" -> -1.0), prior, 1.0) === Seq.empty)
    // a query with no prior entry never flags
    assert(Bench.deviantVsPrior(Seq("q99_new" -> 100.0), prior, 1.0) === Seq.empty)
  }

  test("qmin parsing: the sparse min map reads in all three shapes; absent -> None") {
    // shape 1: raw final line (round 13+) — short keys expand, and an
    // unresolvable key is dropped, never guessed
    val raw =
      """{"metric":"total","value":12.5,"unit":"sec","sent":0.21,"qmin":{"q1":0.20,"q999":9.9},"qmin_n":2,"queries":{"q1":0.46,"p4":1.00}}"""
    assert(Bench.parsePriorMins(raw) === Some(Map("q1_op_filter" -> 0.20)))
    // shape 2: driver wrapper, parsed object
    val wrapper =
      """{"n":13,"parsed":{"metric":"total","qmin":{"p4":0.80},"queries":{"p4":1.00}},"tail":""}"""
    assert(Bench.parsePriorMins(wrapper) === Some(Map("p4_fingerprint" -> 0.80)))
    // shape 3: parsed null, qmin present in the escaped tail text; the
    // LAST qmin occurrence (the final line) wins
    val tailWrapped =
      """{"n":13,"parsed":null,"tail":"noise\n{\"metric\":\"total\",\"sent\":0.2,\"qmin\":{\"q1\":0.25},\"queries\":{\"q1\":0.46}}\n"}"""
    assert(Bench.parsePriorMins(tailWrapped) === Some(Map("q1_op_filter" -> 0.25)))
    // an EMPTY qmin is Some(empty): every min agreed with its median —
    // distinct from a pre-qmin artifact, which is None (min guard falls
    // back to the median baseline)
    assert(Bench.parsePriorMins("""{"qmin":{},"queries":{"q1":0.5}}""") ===
      Some(Map.empty[String, Double]))
    assert(Bench.parsePriorMins("""{"queries":{"q1":0.5}}""").isEmpty)
    assert(Bench.parsePriorMins("not json").isEmpty)
  }

  test("sparse min selection: only material divergence joins, capped, most-divergent first") {
    val results = Seq(
      "q1_op_filter" -> 1.00,   // min 0.95: agrees (>= 0.8x) -> absent
      "q2_before_after" -> 2.00, // min 0.50: 0.25x -> most divergent
      "q12_dedup" -> 1.00,      // min 0.60: 0.6x -> joins, second
      "q3_initial_offset" -> 0.04, // under the jitter floor -> never
      "q4_delta_scan" -> 1.00)  // min -1 (failed) -> never
    val mins = Map("q1_op_filter" -> 0.95, "q2_before_after" -> 0.50,
      "q12_dedup" -> 0.60, "q3_initial_offset" -> 0.01, "q4_delta_scan" -> -1.0)
    val (entries, n) = Bench.sparseMins(results, mins)
    assert(entries === Seq("q2_before_after" -> 0.50, "q12_dedup" -> 0.60))
    assert(n === 2)
    // the cap: QminCap most-divergent entries, true count preserved
    val wide = (1 to 30).map(i => f"q$i%d_x" -> 1.0)
    val wideMins = wide.map { case (q, _) => q -> 0.1 }.toMap
    val (capped, total) = Bench.sparseMins(wide, wideMins)
    assert(capped.size === Bench.QminCap && total === 30)
  }

  test("a contended median misleads where the clean min does not (the r11 q17/q27 trap)") {
    // prior round: median 1.0, min agreed (no qmin entry) -> min baseline
    // falls back to the median. This run: a one-pass disk window inflated
    // the committed MEDIAN 4x, but the min stayed clean.
    val priorMed = Map("q17_asof_join" -> 1.0)
    val medians = Seq("q17_asof_join" -> 4.0)
    val mins = Seq("q17_asof_join" -> 1.05)
    // median comparison flags it...
    assert(Bench.deviantVsPrior(medians, priorMed, 1.0).nonEmpty)
    // ...but min-vs-min(=prior median fallback) exonerates it
    assert(Bench.deviantVsPrior(mins, priorMed, 1.0) === Seq.empty)
    // a GENUINE 4x regression moves the min with the median — both flag
    assert(Bench.deviantVsPrior(Seq("q17_asof_join" -> 4.0),
      priorMed, 1.0).nonEmpty)
    // and with a prior qmin entry, min-vs-min uses the REAL prior min:
    // prior median 1.0 / min 0.4, current min 1.5 — median ratio 1.5x
    // (quiet) but min ratio 3.75x flags the slow creep a median-only
    // guard would miss
    val priorMin = Map("q17_asof_join" -> 0.4)
    assert(Bench.deviantVsPrior(Seq("q17_asof_join" -> 1.5),
      priorMin, 1.0).nonEmpty)
  }

  test("the final short line still fits the tail cap with a full qmin map") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val qs = names.map(n => "\"" + Bench.shortKey(n) + "\":999.99")
      .mkString("{", ",", "}")
    val qmin = names.take(Bench.QminCap)
      .map(n => "\"" + Bench.shortKey(n) + "\":999.99").mkString("{", ",", "}")
    val contam = names.take(Bench.ContamCap)
      .map(n => "\"" + Bench.shortKey(n) + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":99999.99,"unit":"sec","sf":"/root/testdata/sf0.1","sent":0.210,"io_sent":99.999,"qmin":$qmin,"qmin_n":${names.size},"queries":$qs,"contaminated_n":${names.size},"contaminated_queries":$contam}"""
    assert(line.getBytes("UTF-8").length <= 1900,
      s"final line with qmin must stay under the 2,000-byte tail cap, got ${line.length}")
  }

  test("sentinel normalization math: prior sentinel absent -> raw ratios (None)") {
    assert(Bench.parsePriorSentinel("""{"metric":"total","queries":{"q1":0.5}}""").isEmpty)
    assert(Bench.parsePriorSentinel("not json").isEmpty)
    assert(Bench.parsePriorSentinel("""{"sent":-1.0}""").isEmpty) // failed-run marker
  }

  test("garbage and query-free inputs yield None, not a bogus baseline") {
    assert(Bench.parsePriorQueries("not json at all").isEmpty)
    assert(Bench.parsePriorQueries("""{"n": 9, "parsed": null, "tail": "no queries here"}""").isEmpty)
    assert(Bench.parsePriorQueries("").isEmpty)
  }
}
