package graft.operators

import graft.{Exact, Tables}
import graft.Materialize.MatOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join and
  * banded range join (SURVEY §2 #21l/21m). Both are composed from
  * existing operators (shuffle + window / grid-cell equi-join) per
  * the extension preference order — no custom plan node needed, and
  * both shapes scale: one shuffle each, never a broadcast-nested-
  * loop or per-row scan.
  */
object Temporal {
  import Exact._

  /** Generic as-of join: for each left row, the single most recent
    * right row with `rightTime <= leftTime` within the same `keys`
    * group (inclusive). Right rows sharing (keys, time) resolve by
    * `rightTieBreak` ascending, LAST wins — so e.g. tie-break on an
    * id column picks the greatest id, with no separate dedup
    * aggregation (and no extra shuffle) over the right side.
    *
    * Shape: union both sides tagged, ONE shuffle on `keys`, and a
    * running `last(_, ignoreNulls)` over (time, side, tie) order
    * carries the latest right row forward into each left row — the
    * sort-merge formulation of ASOF JOIN (DuckDB executes the same
    * plan class). At 100 TB: no expansion, no range probe per row;
    * cost is the shuffle plus a per-partition sort, identical to any
    * windowed aggregate. Right-side columns surface as `right_<name>`
    * (NULL when no right row precedes the left row).
    *
    * NULL semantics match SQL ASOF JOIN (the DuckDB oracle): a right
    * row with NULL time never matches anything and is dropped before
    * tagging — without the filter Spark's ascending-nulls-first sort
    * would carry it forward as the "most recent" match for left rows
    * preceding every real right row. NULL keys, by contrast, GROUP
    * together (window partitionBy is null-safe), so a null-keyed left
    * row can match a null-keyed right row — callers wanting the SQL
    * never-match-on-null-key behavior should pre-filter their keys.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    val payload = struct(rightCols.map(right(_)): _*)
    val tb = if (rightTieBreak.isEmpty) lit(0L).as("__tb")
      else struct(rightTieBreak.map(right(_)): _*).as("__tb")
    val taggedRight = right.filter(right(rightTime).isNotNull).select(
      keyCols :+ right(rightTime).as("__t") :+ lit(0).as("__side") :+ tb :+
        payload.as("__r"): _*)
    val leftOut = left.columns.toSeq
    val taggedLeft = left.select(
      keyCols :+ left(leftTime).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(taggedRight.schema("__tb").dataType).as("__tb") :+
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r") :+
        struct(leftOut.map(left(_)): _*).as("__l"): _*)
    val unioned = taggedRight.withColumn("__l", lit(null).cast(taggedLeft.schema("__l").dataType))
      .unionByName(taggedLeft)
    // side 0 (right) sorts before side 1 (left) at equal time → the
    // match is inclusive (right_time <= left_time), like ASOF JOIN;
    // equal-time right rows resolve by tie-break ascending, last wins
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      leftOut.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(s"right_$c")): _*)
  }

  /** q22_asof — click-to-purchase attribution: each purchase event
    * matched to the same user's most recent click at-or-before it;
    * same-timestamp clicks resolve to the greatest event_id via the
    * join's tie-break (no dedup aggregation, no extra shuffle of the
    * click fact). Oracle: DuckDB's native ASOF LEFT JOIN over an
    * explicit MAX(event_id) dedup — same semantics.
    */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        epochMs(col("ts")).as("ts_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), epochMs(col("ts")).as("click_ts_ms"),
        col("event_id").as("click_id"))
    asOfJoin(purchases, clicks, Seq("user_id"), "ts_ms", "click_ts_ms",
        Seq("click_id", "click_ts_ms"), rightTieBreak = Seq("click_id"))
      .select(col("purchase_id"), col("user_id"), col("ts_ms"),
        col("right_click_id").as("click_id"),
        col("right_click_ts_ms").as("click_ts_ms"),
        (col("ts_ms") - col("right_click_ts_ms")).as("gap_ms"))
      .orderBy(col("purchase_id"))
  }

  /** q23_range_join — banded temporal range join: for each purchase,
    * how many clicks by the same user landed within ±5 minutes.
    *
    * The naive formulation is an inequality join — Spark would plan
    * a broadcast-nested-loop (O(n·m) comparisons). Instead time is
    * bucketed into band-width grid cells: each purchase probes its
    * cell ±1, clicks keep ONE cell each, and the join is a plain
    * equi-join on (user, cell) followed by the exact |Δt| ≤ band
    * refine — the standard bin-and-refine range-join plan. Any
    * qualifying click is within one band of the purchase, so cell
    * distance ≤ 1 guarantees completeness; each click has a single
    * cell so no pair is counted twice. One shuffle on (user, cell).
    */
  def q23(spark: SparkSession, dir: String, bandMs: Long = 300000L): DataFrame = {
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        epochMs(col("ts")).as("ts_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), epochMs(col("ts")).as("c_ms"))
      .withColumn("cell", floor(col("c_ms") / bandMs))
    val probes = purchases.withColumn("cell",
      explode(array(Seq(-1, 0, 1).map(d => floor(col("ts_ms") / bandMs) + d): _*)))
    val counts = probes.join(clicks, Seq("user_id", "cell"))
      .filter(abs(col("c_ms") - col("ts_ms")) <= bandMs)
      .groupBy(col("purchase_id")).agg(count(lit(1)).as("n_nearby_clicks"))
    purchases.join(counts, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("ts_ms"),
        coalesce(col("n_nearby_clicks"), lit(0L)).as("n_nearby_clicks"))
      .orderBy(col("purchase_id"))
  }

  /** Grid step for [[tsResample]]: hourly. */
  val ResampleStepMs = 3600000L

  /** ts_resample — gap-filled per-key time series (the Timescale
    * `time_bucket_gapfill` / ClickHouse `WITH FILL` shape): each
    * user gets a regular [[ResampleStepMs]] grid spanning their
    * observed range, and every grid point carries the most recent
    * event's value at-or-before it (forward fill) plus its
    * staleness. Grid points before the first event fill NULL — the
    * standard leading edge of ffill.
    *
    * Pure composition: a per-user bounds aggregate (≤|users| rows) →
    * map-side `sequence` explode builds the grid → [[asOfJoin]]
    * (one shuffle, running last-non-null) fills it. No range probe
    * per row, no nested loop; equal-timestamp events resolve to the
    * greatest event_id via the join's tie-break, mirroring the
    * oracle's MAX dedup. At 100 TB the grid is |users|·periods rows
    * — generated distributed, never materialized on the driver.
    */
  def tsResample(spark: SparkSession, dir: String): DataFrame = {
    // a reading with no value is not an observation: NULL-value
    // events neither fill nor block (the oracle's arg_max would skip
    // them within a timestamp but not across — filtering both engines
    // to non-null values is the one consistent semantics)
    val ev = Tables(spark, dir).events
      .filter(col("value").isNotNull)
      .select(col("user_id"), epochMs(col("ts")).as("ts_ms"),
        col("value"), col("event_id"))
    val step = ResampleStepMs
    val bounds = ev.groupBy(col("user_id")).agg(
      (floor(min(col("ts_ms")) / step) * step).cast("long").as("t0"),
      (floor(max(col("ts_ms")) / step) * step).cast("long").as("t1"))
    val grid = bounds.select(col("user_id"),
      explode(sequence(col("t0"), col("t1"), lit(step))).as("grid_ms"))
    asOfJoin(grid, ev, Seq("user_id"), "grid_ms", "ts_ms",
        Seq("value", "ts_ms"), rightTieBreak = Seq("event_id"))
      .select(col("user_id"), col("grid_ms"),
        col("right_value").as("last_value"),
        col("right_ts_ms").as("last_ts_ms"),
        (col("grid_ms") - col("right_ts_ms")).as("staleness_ms"))
      .orderBy(col("user_id"), col("grid_ms"))
  }

  /** ts_seasonal — seasonal decomposition with residual flagging
    * (the classical STL idea integerized to a profile/residual
    * split): each event's value decomposes into a SEASONAL
    * component — the per-(event_type, hour-of-day) profile mean —
    * plus a residual; events whose |residual| exceeds 2× the type's
    * mean absolute residual are flagged. This is the seasonality-
    * aware complement of q26's MAD outliers: a metric that is
    * NORMALLY high at 9am is only anomalous when it deviates from
    * the 9am profile, not from the global median.
    *
    * Exactness: everything on the cents lattice; profile and MAD
    * means are FLOOR divisions computed as (s − pmod(s, n)) div n —
    * pmod makes the numerator exactly divisible, so Spark's
    * truncating `div` lands on the true floor even on NEGATIVE sums
    * (the fuzz corpus's value jitter can cross zero; bare `div`
    * would round toward zero and drift). NOTE DuckDB's integer `//`
    * ALSO truncates toward zero (-7 // 2 = -3; only float `//`
    * floors — verified on DuckDB 1.0.0), so the oracle applies the
    * same pmod correction explicitly rather than relying on `//`.
    *
    * Scale shape: two map-side-combinable aggregations to cards
    * bounded by |types|·24 and |types|, each broadcast back — the
    * corpus is scanned, never shuffled or windowed.
    */
  def tsSeasonal(spark: SparkSession, dir: String): DataFrame =
    tsSeasonalOn(Tables(spark, dir).events)

  private[graft] def tsSeasonalOn(events: DataFrame): DataFrame = {
    val c = events.select(col("event_id"), col("event_type"),
      hour(col("ts")).cast("long").as("hod"),
      (dec2(col("value")) * 100).cast("long").as("value_cents"))
    // prof is |types|·24-bounded but its subtree is a corpus
    // aggregation — lazily it re-planned under BOTH scored consumers
    // (round 16: three corpus scans for one profile); the corpus-
    // sized scored frame stays lazy on purpose (recomputing a
    // broadcast join beats checkpointing corpus rows — guide §5)
    val prof = c.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("sc"))
      .select(col("event_type"), col("hod"),
        expr("(sc - pmod(sc, n)) div n").as("seasonal_cents"))
      .materialized
    val scored = c.join(broadcast(prof), Seq("event_type", "hod"))
      .withColumn("resid_cents", col("value_cents") - col("seasonal_cents"))
    val spread = scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(abs(col("resid_cents"))).as("sa"))
      .select(col("event_type"), expr("(sa - pmod(sa, n)) div n").as("mad_cents"))
    scored.join(broadcast(spread), "event_type")
      .select(col("event_id"), col("event_type"), col("hod"),
        col("value_cents"), col("seasonal_cents"), col("resid_cents"),
        (abs(col("resid_cents")) > col("mad_cents") * 2).cast("long").as("flagged"))
      .orderBy(col("event_id"))
  }

  /** Silence threshold for [[tsGaps]] (~28 h on the event lattice —
    * above the fixture's p99 inter-event delta, so a gap is a
    * finding, not noise; a deployment tunes this to its SLA).
    */
  val GapThresholdMs = 100000000L

  /** ts_gaps — missing-data interval DETECTION (the complement of
    * q45_gap_fill, which repairs: a telemetry pipeline first lists
    * where the silences are, then decides fill/resample/alert): per
    * user, every inter-event silence longer than [[GapThresholdMs]],
    * as (gap_start_ms, gap_end_ms, gap_ms). Epoch-millisecond
    * integers end to end (both engines truncate the sub-ms residue
    * the same way), strict `>` at the threshold so the boundary is
    * lattice-exact. One user-partitioned LEAD window over a
    * (ts, event_id) total order — the q17_running high-cardinality
    * shape; output is bounded by the true gap count.
    */
  def tsGaps(spark: SparkSession, dir: String): DataFrame =
    tsGapsOn(Tables(spark, dir).events)

  private[graft] def tsGapsOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("ts"),
        expr("unix_micros(ts) div 1000").as("t_ms"))
      .withColumn("next_ms", lead(col("t_ms"), 1).over(w))
      .filter(col("next_ms").isNotNull &&
        col("next_ms") - col("t_ms") > GapThresholdMs)
      .select(col("user_id"), col("t_ms").as("gap_start_ms"),
        col("next_ms").as("gap_end_ms"),
        (col("next_ms") - col("t_ms")).as("gap_ms"))
      .orderBy(col("user_id"), col("gap_start_ms"), col("gap_end_ms"))
  }

  /** Seasonal period for [[tsForecast]]: 24 hourly buckets — the
    * daily cycle [[tsSeasonal]]'s profile already establishes this
    * corpus has.
    */
  val ForecastPeriodHours = 24L

  /** ts_forecast — the seasonal-naive BACKTEST card (ts_seasonal
    * profiles the cycle; this measures how predictive it actually
    * is — the baseline every forecasting effort must beat, and the
    * number that says whether a series is forecastable at all): the
    * hourly per-type value series, forecast(h) = observed(h − 24),
    * evaluated over every hour where both sides exist. Per type:
    * evaluated hours, MAE and signed BIAS in cents (integer means —
    * a nonzero bias flags trend the seasonal model misses), and WAPE
    * in ppm (Σ|err| / Σ|obs| — the scale-free error a mixed-volume
    * type set can be compared on).
    *
    * Exactness: values land on the cents lattice (dec2·100, the
    * ts_seasonal convention), hours on unix_micros div 3600·10⁶;
    * every mean is truncating integer `div` (sign-correct on the
    * signed bias — both engines truncate toward zero) and the WAPE
    * numerator is promoted to DECIMAL(38) before the ×10⁶.
    *
    * Scale shape: one (type, hour)-keyed map-side-combinable
    * aggregation (the series), one self-equi-join on (type, h = h+24)
    * — co-partitioned, never a window over a type-bounded partition
    * of raw events — and a type-keyed card aggregation.
    */
  def tsForecast(spark: SparkSession, dir: String): DataFrame =
    tsForecastOn(Tables(spark, dir).events)

  private[graft] def tsForecastOn(events: DataFrame): DataFrame = {
    val hourly = events.filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("h"))
      .agg(sum(col("cents")).as("obs"))
    val pred = hourly.select(col("event_type"),
      (col("h") + ForecastPeriodHours).as("h"), col("obs").as("p"))
    hourly.join(pred, Seq("event_type", "h"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("obs") - col("p"))).as("sae"),
        sum(col("obs") - col("p")).as("se"),
        sum(abs(col("obs"))).as("sa"))
      .select(col("event_type"), col("n_eval"),
        expr("sae div n_eval").as("mae_cents"),
        expr("se div n_eval").as("bias_cents"),
        expr("CASE WHEN sa = 0 THEN 0L ELSE " +
          "CAST(CAST(sae AS DECIMAL(38,0)) * 1000000 div sa AS BIGINT) END")
          .as("wape_ppm"))
      .orderBy(col("event_type"))
  }
}
