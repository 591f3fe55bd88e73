package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CEP-style pattern detection over a change/event stream — the Siddhi
  * host-language surface the reference extension feeds
  * (`@source(type='cdc')` streams are consumed by Siddhi pattern queries:
  * `from every a=S -> b=S[cond] within T select ...`). The BASELINE.json
  * north star calls this out as the partially-covered capability, so the
  * engine provides it as first-class batch operators (streaming analogs in
  * [[graft.streaming.StreamPatterns]]).
  *
  * All three detectors are ONE pass over a per-key window — shuffle once on
  * the key, sort within partitions, no self-join, no global window — so at
  * 100 TB they scale like any keyed aggregation (the dominant cost is the
  * single hash exchange on `key`).
  *
  * Determinism: event order is the total order (ts, id); the "first B
  * after A" is picked via a lexicographic min over zero-padded
  * `(ts, id)` strings, which any SQL engine reproduces bit-for-bit
  * (no argmin/struct-ordering divergence).
  */
object Patterns {

  private val TsPad = 20 // fits epoch ns (19 digits through year 2262) or any smaller unit
  private val IdPad = 12

  /** Zero-padded sortable "ts:id" key (non-negative inputs). */
  private def seqKey(ts: Column, id: Column): Column =
    concat(lpad(ts.cast("string"), TsPad, "0"), lpad(id.cast("string"), IdPad, "0"))

  /** `floorDiv(ts, p)` as an all-integer column: SQL `div` truncates
    * toward zero, which diverges from the streaming twins'
    * `Math.floorDiv` for negative timestamps — subtracting `pmod` first
    * makes the dividend an exact multiple, so truncation IS floor, for
    * any sign, with no double-precision mantissa loss on ns epochs. */
  private def floorDivCol(tsCol: String, p: Long): Column =
    expr(s"(`$tsCol` - pmod(`$tsCol`, ${p}L)) div ${p}L")

  /** Events + `_next_b` = seqKey of the FIRST following `typeB` event for
    * the same key (strictly after in (ts, id) order), or null.
    *
    * Framed as a DESC-ordered GROWING frame, not `rowsBetween(1,
    * unboundedFollowing)`: "strictly after in (ts, id) ASC" ≡ "strictly
    * before in (ts, id) DESC" ((ts, id) is a total order — ids are
    * unique — so the two framings select identical row sets), and Spark
    * evaluates unbounded-PRECEDING frames incrementally (one aggregate
    * update per row) while unbounded-FOLLOWING frames recompute from
    * scratch per row — O(rows²) per key partition, measured 2× slower on
    * the events table at sf0.1. */
  private def withNextB(events: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, typeCol: String, typeB: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events.withColumn("_next_b",
      min(when(col(typeCol) === typeB, seqKey(col(tsCol), col(idCol)))).over(w))
  }

  private def nextBTs(c: Column): Column = substring(c, 1, TsPad).cast("long")
  private def nextBId(c: Column): Column = substring(c, TsPad + 1, IdPad).cast("long")

  /** Sequence pattern `every A -> B within T` (first-match): for every
    * `typeA` event, the earliest `typeB` event of the same key within
    * `within` time units after it.
    * Output: (key, a_id, b_id, gap).
    *
    * Siddhi analog: `from every a=s[type=='A'] -> b=s[type=='B'] within T`.
    */
  def followedBy(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 typeCol: String, typeA: String, typeB: String, within: Long): DataFrame =
    withNextB(events, keyCol, tsCol, idCol, typeCol, typeB)
      .where(col(typeCol) === typeA && col("_next_b").isNotNull &&
        nextBTs(col("_next_b")) - col(tsCol) <= within)
      .select(col(keyCol), col(idCol).as("a_id"),
        nextBId(col("_next_b")).as("b_id"),
        (nextBTs(col("_next_b")) - col(tsCol)).as("gap"))

  /** Absence pattern `A not followed by B within T`: every `typeA` event
    * with NO `typeB` event of the same key in the next `within` time units.
    * Output: (key, a_id).
    *
    * Siddhi analog: `from a=s[type=='A'] -> not s[type=='B'] for T`.
    */
  def absence(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
              typeCol: String, typeA: String, typeB: String, within: Long): DataFrame =
    withNextB(events, keyCol, tsCol, idCol, typeCol, typeB)
      .where(col(typeCol) === typeA &&
        (col("_next_b").isNull || nextBTs(col("_next_b")) - col(tsCol) > within))
      .select(col(keyCol), col(idCol).as("a_id"))

  /** Logical conjunction pattern `A and B within T`: every `typeA` event
    * with a `typeB` event of the same key within `within` time units in
    * EITHER direction; reports the nearest such B (tie → the earlier B).
    * Output: (key, a_id, b_id, gap) with gap = |tb − ta| ≥ 0.
    *
    * Same single-exchange shape as [[followedBy]]: two per-key window
    * passes (nearest B before via max-over-preceding, nearest B after via
    * min-over-following) — no self-join.
    *
    * Siddhi analog: `from every (a=s[type=='A'] and b=s[type=='B']) within T`.
    */
  def conjunction(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                  typeCol: String, typeA: String, typeB: String, within: Long): DataFrame = {
    val wPrev = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // _next_b shares the followedBy/absence definition (ONE first-following-B
    // contract); only the backward-looking _prev_b is conjunction-specific
    val withBoth = withNextB(events, keyCol, tsCol, idCol, typeCol, typeB)
      .withColumn("_prev_b",
        max(when(col(typeCol) === typeB, seqKey(col(tsCol), col(idCol)))).over(wPrev))
    val gapN = nextBTs(col("_next_b")) - col(tsCol)
    val gapP = col(tsCol) - nextBTs(col("_prev_b"))
    val okN = col("_next_b").isNotNull && gapN <= within
    val okP = col("_prev_b").isNotNull && gapP <= within
    withBoth.where(col(typeCol) === typeA && (okN || okP))
      .withColumn("_use_prev", okP && (!okN || gapP <= gapN))
      .select(col(keyCol), col(idCol).as("a_id"),
        when(col("_use_prev"), nextBId(col("_prev_b")))
          .otherwise(nextBId(col("_next_b"))).as("b_id"),
        when(col("_use_prev"), gapP).otherwise(gapN).as("gap"))
  }

  /** Chained sequence pattern `every A -> B -> C within T` (first-match):
    * for every `typeA` event, the first `typeB` event strictly after it,
    * then the first `typeC` event strictly after that B, with the whole
    * chain inside `within` time units of A (Siddhi's `within` spans the
    * pattern from first to last element). No backtracking: if the first
    * B's chain overruns the horizon, the instance fails — Siddhi
    * first-match semantics, and exactly what the streaming twin emits.
    * Output: (key, a_id, b_id, c_id, gap = tc − ta).
    *
    * Same ONE-exchange shape as [[followedBy]]: two window passes over
    * the identical (key, ts DESC, id DESC) growing frame — pass 1
    * computes each row's first-following C; pass 2 computes the
    * first-following B *carrying that B row's pass-1 value* as a
    * fixed-width min payload. The B seqKey prefix is unique within the
    * key, so the payload can never influence which B wins the min; '~'
    * (> any hex/digit) marks a B with no following C. Both passes share
    * one sort and one hash exchange — no self-join, no extra shuffle.
    *
    * Siddhi analog: `from every a=s[type=='A'] -> b=s[type=='B'] ->
    * c=s[type=='C'] within T`.
    */
  def chain(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
            typeCol: String, typeA: String, typeB: String, typeC: String,
            within: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withC = events.withColumn("_next_c",
      min(when(col(typeCol) === typeC, seqKey(col(tsCol), col(idCol)))).over(w))
    val withBC = withC.withColumn("_next_bc",
      min(when(col(typeCol) === typeB,
        concat(seqKey(col(tsCol), col(idCol)),
          coalesce(col("_next_c"), lit("~"))))).over(w))
    val cTs = substring(col("_next_bc"), TsPad + IdPad + 1, TsPad).cast("long")
    val cId = substring(col("_next_bc"), 2 * TsPad + IdPad + 1, IdPad).cast("long")
    withBC.where(col(typeCol) === typeA && col("_next_bc").isNotNull &&
        substring(col("_next_bc"), TsPad + IdPad + 1, 1) =!= "~" &&
        cTs - col(tsCol) <= within)
      .select(col(keyCol), col(idCol).as("a_id"),
        nextBId(col("_next_bc")).as("b_id"), cId.as("c_id"),
        (cTs - col(tsCol)).as("gap"))
  }

  /** Guarded sequence pattern `every A -> B[guard(a, b)] within T`
    * (first-match): for every `typeA` event, the earliest following
    * `typeB` event within the horizon WHOSE GUARD — a predicate over
    * both bindings' value columns — holds. Siddhi filters routinely
    * reference earlier bindings (`e2=S[price > e1.price]`); the guard
    * makes the "first B" A-dependent, which no per-row window aggregate
    * can express (the window trick of [[followedBy]] needs a row-local
    * predicate). Output: (key, a_id, b_id, a_value, gap).
    *
    * Shape: a TEMPORAL BAND JOIN — time is bucketed into `within`-wide
    * bands, each B is duplicated into its own and the following band
    * (any A whose horizon reaches a B lives in one of those two), and
    * the join runs on (key, band). Candidates are then (A, B) pairs with
    * 0 < tb−ta ≤ within (ties on ts resolved by id, same total order as
    * every detector here) and the guard true; one min-aggregation picks
    * the earliest B per A. Banding is what makes a hot key survive
    * scale: a plain key join would pair every A with the key's ENTIRE
    * B history (|A|·|B| before the time filter), while bands bound the
    * blow-up to each 2·within temporal neighborhood — the pair count
    * scales with horizon density, not history length. This is the
    * honest fallback CEP engines pay for binding-dependent guards; keep
    * guards off and [[followedBy]] stays O(n).
    *
    * Siddhi analog: `from every a=s[type=='A'] ->
    * b=s[type=='B' and b.value > a.value] within T`.
    */
  def guardedFollowedBy(events: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, typeCol: String, valueCol: String,
                        typeA: String, typeB: String, within: Long,
                        guard: (Column, Column) => Column): DataFrame = {
    require(within > 0, s"within must be positive (bands divide by it), got $within")
    val a = events.where(col(typeCol) === typeA).select(
      col(keyCol).as("_k"), col(tsCol).as("_ta"), col(idCol).as("a_id"),
      col(valueCol).as("a_value"),
      // integer division: ts/within in doubles would shave mantissa bits
      // off ns-scale epochs; floor semantics match the streaming twins
      floorDivCol(tsCol, within).as("_band"))
    // a B at band p can complete an A from band p or p-1 — emit it into
    // both, so the equi-join on (_k, _band) sees every reachable pair
    val b = events.where(col(typeCol) === typeB).select(
      col(keyCol).as("_k"), col(tsCol).as("_tb"), col(idCol).as("_b_id"),
      col(valueCol).as("b_value"),
      explode(array(floorDivCol(tsCol, within),
        floorDivCol(tsCol, within) - 1)).as("_band"))
    val strictlyAfter = col("_tb") > col("_ta") ||
      (col("_tb") === col("_ta") && col("_b_id") > col("a_id"))
    a.join(b, Seq("_k", "_band"))
      .where(strictlyAfter && col("_tb") - col("_ta") <= within &&
        guard(col("a_value"), col("b_value")))
      .groupBy(col("_k").as(keyCol), col("a_id"), col("_ta"), col("a_value"))
      .agg(min(seqKey(col("_tb"), col("_b_id"))).as("_first"))
      .select(col(keyCol), col("a_id"),
        nextBId(col("_first")).as("b_id"), col("a_value"),
        (nextBTs(col("_first")) - col("_ta")).as("gap"))
  }

  /** Logical disjunction pattern `every (a or b)`: the pattern completes
    * on EACH event matching either branch — the arrived branch's variable
    * binds, the other is null; an event matching both branches (typeA ==
    * typeB) binds the first-declared one, like Siddhi's left-to-right
    * branch evaluation. Output: (key, a_id, b_id), exactly one non-null.
    *
    * Unlike [[conjunction]], disjunction needs NO cross-event state: it
    * is a branch-tagged union of two type filters, so it runs entirely
    * inside the scan stage with ZERO exchanges (a `within T` clause on a
    * bare disjunction is trivially satisfied — one event completes the
    * pattern; a disjunct feeding a sequence step composes [[followedBy]]
    * over this output). PlanShapeSpec pins the no-exchange plan.
    *
    * Siddhi analog: `from every (a=s[type=='A'] or b=s[type=='B'])`.
    */
  def disjunction(events: DataFrame, keyCol: String, idCol: String,
                  typeCol: String, typeA: String, typeB: String): DataFrame =
    events.where(col(typeCol) === typeA || col(typeCol) === typeB)
      .select(col(keyCol),
        when(col(typeCol) === typeA, col(idCol)).as("a_id"),
        when(col(typeCol) =!= typeA && col(typeCol) === typeB, col(idCol)).as("b_id"))

  /** Count pattern (burst): every `typeX` event that is the `minCount`-th
    * or later of its key within the trailing `windowLen` time units (sliding
    * range-window count — "3 failed logins in 10 minutes").
    * Output: (key, id, cnt).
    *
    * Siddhi analog: `from s[type=='X']#window.time(T) ... having count >= n`.
    */
  def burst(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
            typeCol: String, typeX: String, windowLen: Long, minCount: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rangeBetween(-windowLen, 0)
    events.where(col(typeCol) === typeX)
      .withColumn("cnt", count(lit(1)).over(w))
      .where(col("cnt") >= minCount)
      .select(col(keyCol), col(idCol), col("cnt"))
  }

  /** Count-quantifier sequence `a<n:> -> b within T`: every `typeB` event
    * whose trailing `within` range window holds >= `minCount` `typeA`
    * events ("a purchase preceded by 3+ views in 24 h"). Peers at the
    * same ts are inside the RANGE frame in both Spark and ANSI SQL, so
    * the oracle agrees by construction.
    * Output: (key, b_id, a_cnt).
    *
    * Same single-exchange shape as [[burst]] — one keyed shuffle, one
    * sliding range frame (two-pointer evaluation, O(rows) amortized);
    * the conditional count lets both types share one window pass.
    *
    * Siddhi analog: `from every e1=s[type=='A']<n:> -> e2=s[type=='B']
    * within T`. */
  def countSequence(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                    typeCol: String, typeA: String, typeB: String,
                    within: Long, minCount: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rangeBetween(-within, 0)
    // other types never enter the count (frame bounds are ts-based) and
    // never survive the typeB filter — drop them before the exchange
    events.where(col(typeCol).isin(typeA, typeB))
      .withColumn("_a_cnt", count(when(col(typeCol) === typeA, 1)).over(w))
      .where(col(typeCol) === typeB && col("_a_cnt") >= minCount)
      .select(col(keyCol), col(idCol).as("b_id"), col("_a_cnt").as("a_cnt"))
  }

  /** Sliding LENGTH window `s#window.length(n)` — the count-based member
    * of Siddhi's window family (time → [[burst]], timeBatch → batch
    * rollup, session → [[sessionize]]): at every event, an aggregate
    * over the last `n` events of its key (this one inclusive),
    * regardless of how far apart they are in time.
    * Output: (key, id, win_cnt, win_sum) with win_cnt <= n ramping up at
    * the key's start and win_sum the DECIMAL-exact trailing sum exposed
    * as double (float summation order would diverge between engines).
    *
    * One keyed exchange + one trailing ROWS frame (incremental, O(rows));
    * the streaming twin's state is bounded by n events per key — the
    * only detector whose state does not depend on time at all.
    *
    * Siddhi analog: `from s[type=='X']#window.length(n)
    * select sum(value)`. */
  def lengthWindow(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                   valueCol: String, n: Int): DataFrame = {
    require(n >= 1, s"window length must be >= 1, got $n")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(n - 1), 0)
    events
      .withColumn("win_cnt", count(lit(1)).over(w))
      .withColumn("win_sum", sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double"))
      .select(col(keyCol), col(idCol).as("id"), col("win_cnt"), col("win_sum"))
  }

  /** Tumbling LENGTH-BATCH window `s#window.lengthBatch(n)` — the
    * count-TUMBLING member of the window family ([[lengthWindow]] is the
    * count-SLIDING one): events partition into consecutive batches of
    * exactly `n` per key in (ts, id) order, and each COMPLETE batch
    * emits one aggregate row; the trailing partial batch emits nothing
    * (Siddhi's lengthBatch flushes only when the window fills).
    * Output: (key, batch_no, batch_sum, first_id, last_id), batch_no
    * 0-based.
    *
    * One keyed exchange: the row_number frame assigns positions, the
    * batch id is an integer floor-division of the position, and the
    * per-batch rollup groups on (key, batch) — partial-aggregated, and
    * never wider than the window exchange that precedes it. Sum rides
    * decimal like [[lengthWindow]] (float order would diverge between
    * engines).
    *
    * Siddhi analog: `from s[type=='X']#window.lengthBatch(n)
    * select sum(value)`. */
  def lengthBatch(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                  valueCol: String, n: Int): DataFrame = {
    require(n >= 1, s"batch length must be >= 1, got $n")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_pos", row_number().over(w))
      .withColumn("_batch", ((col("_pos") - 1) / n).cast("long"))
      .groupBy(col(keyCol), col("_batch").as("batch_no"))
      .agg(count(lit(1)).as("_cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("batch_sum"),
        min_by(col(idCol), col("_pos")).as("first_id"),
        max_by(col(idCol), col("_pos")).as("last_id"))
      .where(col("_cnt") === n)
      .select(col(keyCol), col("batch_no"), col("batch_sum"),
        col("first_id"), col("last_id"))
  }

  /** Output rate limiting `output first every T` (alert throttling): of
    * each key's events, keep only the FIRST inside every `period`-wide
    * tumbling time bucket — Siddhi's output-rate-limit clause, the knob
    * that turns a firehose of matches into one alert per key per hour.
    * Output: (key, id, bucket_start).
    *
    * One keyed exchange + one row_number frame over (key, bucket);
    * buckets are aligned to epoch 0 like Siddhi's timer (integer
    * division with floor semantics — agrees with the streaming twins'
    * `Math.floorDiv` for any timestamp sign).
    *
    * Siddhi analog: `from s[...] ... output first every T`. */
  def outputFirstEvery(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, period: Long): DataFrame = {
    require(period > 0, s"period must be positive, got $period")
    val bucket = floorDivCol(tsCol, period)
    val w = Window.partitionBy(col(keyCol), bucket)
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col(keyCol), col(idCol).as("id"),
        (bucket * period).as("bucket_start"))
  }

  /** Output rate limiting `output last every T`: the LAST event of each
    * key inside every `period`-wide tumbling bucket — the trailing-edge
    * variant of [[outputFirstEvery]] (Siddhi's clause admits
    * first|last|all). Output: (key, id, bucket_start). */
  def outputLastEvery(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, period: Long): DataFrame = {
    require(period > 0, s"period must be positive, got $period")
    val bucket = floorDivCol(tsCol, period)
    val w = Window.partitionBy(col(keyCol), bucket)
      .orderBy(col(tsCol).desc, col(idCol).desc)
    events
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col(keyCol), col(idCol).as("id"),
        (bucket * period).as("bucket_start"))
  }

  /** Session windows: consecutive same-key events merge while the gap to
    * the previous event is <= `gap`; emits one row per session.
    * Output: (key, session_start, n_events) — the start is min(ts)
    * of the session, an exact integer any engine reproduces (built-in
    * `session_window` would expose µs-truncated timestamps instead).
    *
    * Single pass: lag + conditional cumulative-sum assigns session ids
    * within the per-key sort — same one-exchange shape as the detectors
    * above. Siddhi analog: `s#window.session(gap, key)`.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_new_sess",
        when(col(tsCol) - lag(col(tsCol), 1).over(order) <= gap, 0L).otherwise(1L))
      .withColumn("_sess", sum(col("_new_sess")).over(cum))
      .groupBy(col(keyCol), col("_sess"))
      .agg(min(col(tsCol)).as("session_start"), count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_start"), col("n_events"))
  }

  /** Time-length window `s#window.timeLength(T, n)` — sliding window
    * bounded by BOTH a time span and a count: for each event, the
    * window holds the last `min(n, events within (ts−T, ts])` events in
    * (ts, id) order. Output: (key, id, win_cnt, win_sum) like
    * [[lengthWindow]].
    *
    * Shape: the time bound rides a RANGE frame (events expired at
    * `ts − T` counted from unbounded-preceding — ties on ts stay
    * consistent with the (ts, id) total order because an expired event's
    * ts is strictly smaller); the count cap turns into a dynamic-length
    * suffix sum computed as a difference of running sums
    * (`cum[i] − cum[i − win_cnt]`). Spark window frames cannot vary per
    * row, but `win_cnt` is BOUNDED by the window length `n`, so for the
    * Siddhi-sized `n` this operator exists for (a small constant) the
    * back-reference is `element_at(array(lag(cum,1)..lag(cum,n)),
    * win_cnt)` — n lags over the already-established (key) ordering, no
    * join, no second derivation of the windowed stream (r17: the former
    * self-join re-derived the scan + exchange + window chain for the
    * probe side; q31 0.52 → 0.44 s min and the plan drops one scan, one
    * exchange and two window passes). Past [[TimeLengthMaxLagChain]] the
    * original (key, rn) self-join takes over — a thousand-branch lag
    * array would blow codegen past spark.sql.codegen.maxFields for no
    * win — both sides of that join hash-cluster on the key, so even
    * there no NEW exchange is introduced. Sums ride decimal, the
    * repo-wide float-order contract; route parity is pinned in
    * PatternsSpec. */
  def timeLengthWindow(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, valueCol: String, spanUs: Long,
                       n: Int): DataFrame = {
    require(spanUs > 0 && n >= 1, s"need positive span and count, got $spanUs/$n")
    val order = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val expiredFrame = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, -spanUs)
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events
      .withColumn("_rn", row_number().over(order).cast("long"))
      .withColumn("_expired", count(lit(1)).over(expiredFrame))
      .withColumn("_wcnt", least(col("_rn") - col("_expired"), lit(n.toLong)))
      .withColumn("_cum", sum(col(valueCol).cast("decimal(18,2)")).over(cum))
    val withPrev =
      if (n <= TimeLengthMaxLagChain)
        base.withColumn("_pcum", element_at(
          array((1 to n).map(k => lag(col("_cum"), k).over(order)): _*),
          col("_wcnt").cast("int")))
      else {
        val prev = base.select(col(keyCol).as("_pk"), col("_rn").as("_prn"),
          col("_cum").as("_pcum"))
        base.join(prev, col(keyCol) === col("_pk") &&
          (col("_rn") - col("_wcnt")) === col("_prn"), "left")
      }
    withPrev
      .select(col(keyCol), col(idCol).as("id"), col("_wcnt").as("win_cnt"),
        (col("_cum") - coalesce(col("_pcum"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("win_sum"))
  }

  /** Largest count bound resolved by [[timeLengthWindow]]'s lag-chain
    * route; larger windows take the (key, rn) self-join. */
  private[operators] val TimeLengthMaxLagChain = 64

  /** Sort window `s#window.sort(n, value, 'asc')` — the window that
    * holds the n BEST events by sort order seen so far (an arriving
    * event evicts the current worst when the window is full). The batch
    * analog answers "what does the window hold after the stream
    * replays": per key, the top-`n` events by (value asc, id asc) — the
    * same final-state framing as the latest-state and session queries.
    * Output: (key, rk, id, value), rk 1-based in window order.
    *
    * One keyed exchange + per-key row_number; at 100 TB key cardinality
    * is the parallelism and n is a constant, so no reducer ever holds
    * more than its keys' rows (this is the window-function shape, not a
    * global top-n sort). */
  def sortWindow(events: DataFrame, keyCol: String, idCol: String,
                 valueCol: String, n: Int): DataFrame = {
    require(n >= 1, s"sort window size must be >= 1, got $n")
    val w = Window.partitionBy(keyCol).orderBy(col(valueCol), col(idCol))
    events
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= n)
      .select(col(keyCol), col("rk"), col(idCol).as("id"), col(valueCol))
  }

  /** Delay window `s#window.delay(T)` — Siddhi holds every event back
    * for `T` before releasing it downstream, so a consumer at time t
    * sees the stream as of `t − T` (the classic late-joining /
    * change-vs-past comparison primitive). The batch analog answers,
    * per event, "what had the delayed stream released when this event
    * arrived": count + decimal-exact sum of the key's events with
    * `ts' <= ts − T` (an event delayed at ts' surfaces at ts' + T, so
    * it is visible at ts iff ts' + T <= ts). Output:
    * (key, id, rel_cnt, rel_sum) — rel_cnt 0 while the delayed stream
    * is still "dark" at the key's start.
    *
    * One keyed exchange + one RANGE frame (ts-bounded, so intra-ts
    * ordering cannot matter — the released set is a ts cut, never a row
    * cut). The streaming twin's state is O(T·rate) per key: events
    * older than `watermark − T` fold into a running (cnt, cents)
    * sentinel and leave the buffer. */
  def delayWindow(events: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String, delayUs: Long): DataFrame = {
    require(delayUs > 0, s"delay must be positive, got $delayUs")
    val released = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, -delayUs)
    events
      .withColumn("rel_cnt", count(lit(1)).over(released))
      .withColumn("rel_sum",
        coalesce(sum(col(valueCol).cast("decimal(18,2)")).over(released),
          lit(0).cast("decimal(18,2)")).cast("double"))
      .select(col(keyCol), col(idCol).as("id"), col("rel_cnt"), col("rel_sum"))
  }

  /** Lossy-frequent window `s#window.lossyFrequent(support)` — Siddhi
    * keeps events whose attribute value's frequency exceeds a SUPPORT
    * FRACTION of the stream (via the lossy-counting sketch, the
    * variable-cardinality sibling of [[frequentTypes]]'s fixed top-k).
    * The batch analog is the exact answer: per key, the attribute
    * values with `cnt/total >= support`, tested as the integer
    * cross-multiply `cnt * 1000 >= support_milli * total` so no float
    * ratio can drift between engines. Output: (key, attr, cnt, total)
    * ordered (cnt desc, attr asc) by the caller's ORDER BY.
    *
    * Scale shape: the same two partial-agg passes as [[frequentTypes]]
    * — rows collapse to (key, attr) cells map-side, the per-key total
    * rides a window over cell-sized data; the sketch becomes necessary
    * only when one key's distinct-attribute cardinality explodes. */
  def lossyFrequent(events: DataFrame, keyCol: String, attrCol: String,
                    supportMilli: Long): DataFrame = {
    require(supportMilli > 0 && supportMilli <= 1000,
      s"support must be in (0, 1000] milli-units, got $supportMilli")
    val counts = events.groupBy(col(keyCol), col(attrCol))
      .agg(count(lit(1)).as("cnt"))
    val total = Window.partitionBy(keyCol)
    counts.withColumn("total", sum(col("cnt")).over(total))
      .where(col("cnt") * 1000 >= lit(supportMilli) * col("total"))
      .select(col(keyCol), col(attrCol), col("cnt"), col("total"))
  }

  /** Frequent window `s#window.frequent(k)` — Siddhi keeps the events
    * whose attribute value is among the k most frequent (via the
    * Misra–Gries lossy counter). The batch analog is the EXACT answer
    * the sketch approximates: per key, the top-`k` attribute values by
    * count, deterministic tie-break (count desc, value asc). Output:
    * (key, rk, attribute value, cnt), rk 1-based.
    *
    * Scale shape: partial aggregation collapses rows to (key, value)
    * CELLS before the exchange, and the top-k window runs over
    * cell-sized data — the sketch becomes necessary only when a single
    * key's DISTINCT attribute cardinality explodes, which an
    * `approx_top_k` swap-in covers without changing the contract. */
  def frequentTypes(events: DataFrame, keyCol: String, attrCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"frequent window size must be >= 1, got $k")
    val counts = events.groupBy(col(keyCol), col(attrCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(keyCol).orderBy(col("cnt").desc, col(attrCol))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col(keyCol), col("rk"), col(attrCol), col("cnt"))
  }
}
