package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Touch attribution over an event stream: for every conversion event,
  * which earlier event gets the credit — the user's FIRST touch (first
  * event ever) and LAST touch (the event immediately preceding the
  * conversion). The standard marketing/product-analytics join of a
  * conversion back onto its influencing history, done without a join.
  *
  * Spark shape: ONE shuffle on the user key. Both attribution columns
  * and the prior-event count are windows over the SAME
  * (partition, order) spec — (user, time, tie) — so they share a single
  * exchange + sort; the conversion filter then drops the non-conversion
  * rows. No self-join of events onto events (which would shuffle the
  * stream twice and explode on hot users), no per-user collect.
  *
  * Determinism: order ties break on `tieCol`; rows with NULL time are
  * excluded (they have no position in the history).
  *
  * Reference analog: none (events-analytics extension per the build
  * brief; complements [[Funnel]] / [[Sessionize]]).
  */
object Attribution {

  /** (tieCol, userCol, first_touch, last_touch, n_prior) — one row per
    * conversion event (`typeCol === conversionType`). `first_touch` /
    * `last_touch` are NULL (and `n_prior` 0) when the conversion is the
    * user's first event.
    */
  def touchAttribution(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      typeCol: String,
      tieCol: String,
      conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(timeCol), col(tieCol))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col(timeCol).isNotNull)
      .select(
        col(tieCol), col(userCol), col(typeCol),
        first(col(typeCol)).over(prior).as("first_touch"),
        lag(col(typeCol), 1).over(w).as("last_touch"),
        count(lit(1)).over(prior).as("n_prior"))
      .filter(col(typeCol) === conversionType)
      .drop(typeCol)
  }

  /** Sentinel states of [[markovRemoval]]'s chain. Real channel names
    * may not collide with them (loudly enforced) — the un-spoofable-
    * encoding discipline. */
  val StartState = "__START__"
  val ConvState = "__CONV__"
  val DropState = "__NULL__"

  /** Markov removal-effect attribution (Anderl et al.) — the
    * whole-journey answer to "which channel actually DRIVES
    * conversions" that first/last-touch ([[touchAttribution]])
    * structurally cannot give: fit a first-order Markov chain over
    * user paths (START → events → conversion | dropout), then for each
    * channel ask how much total conversion probability survives when
    * that channel is knocked out (transitions INTO it become dropout).
    * removal_effect = 1 − P_removed/P_full — a channel whose removal
    * halves conversions carries half the credit, regardless of where
    * in the path it sits.
    *
    * Paths truncate at the user's FIRST conversion; non-converting
    * paths terminate in an explicit dropout state, so every row of the
    * transition matrix is a proper distribution. Conversion
    * probability is computed by K fixed steps of the forward recursion
    * v' = v·P over transient states, accumulating the mass absorbed
    * into conversion each step (fixed K, not a convergence test — the
    * library's iterative-fit determinism contract; with every row
    * leaking to absorbing states the truncation error decays
    * geometrically). Every probability and every accumulated product
    * is r6-pinned with DECIMAL-exact sums, so the recursion is
    * engine-replayable (the DuckDB oracle runs the same K steps as
    * staged CTEs).
    *
    * Scale shape: ONE user-keyed window pass + one groupBy builds the
    * (states+2)²-bounded transition-count frame; that frame (and ONLY
    * that frame) is collected under a loud cap — the bounded-collect
    * contract of k-means centroids and the BPE vocab — and the K·|C|
    * chain replays are driver-side closed-form arithmetic on ≤ a few
    * hundred doubles, not Spark stages. The event log is scanned once.
    *
    * Output: one row per non-conversion channel —
    * (channel, n_transitions, p_full, p_removed, removal_effect),
    * removal_effect NULL when P_full = 0.
    */
  def markovRemoval(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      typeCol: String,
      tieCol: String,
      conversionType: String,
      iters: Int = 12,
      maxStates: Int = 64): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val w = Window.partitionBy(col(userCol)).orderBy(col(timeCol), col(tieCol))
    val rows = events
      .filter(col(timeCol).isNotNull)
      .select(col(userCol).as("__u"),
        when(col(typeCol) === conversionType, lit(ConvState))
          .otherwise(col(typeCol).cast("string")).as("__st"),
        row_number().over(w).as("__rn"))
    val wu = Window.partitionBy(col("__u"))
    val kept = rows
      .withColumn("__cp", min(when(col("__st") === ConvState, col("__rn"))).over(wu))
      .filter(col("__cp").isNull || col("__rn") <= col("__cp"))
    val wk = Window.partitionBy(col("__u")).orderBy(col("__rn"))
    val inner = kept.select(
      coalesce(lag(col("__st"), 1).over(wk), lit(StartState)).as("from"),
      col("__st").as("to"))
    val lastRow = kept
      .withColumn("__mx", max(col("__rn")).over(wu))
      .filter(col("__rn") === col("__mx") && col("__cp").isNull)
      .select(col("__st").as("from"), lit(DropState).as("to"))
    val counts = inner.unionByName(lastRow)
      .groupBy(col("from"), col("to"))
      .agg(count(lit(1)).as("n"))
    val mat = counts.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    require(mat.length <= maxStates * maxStates,
      s"markovRemoval: ${mat.length} transition cells exceed the " +
        s"$maxStates-state bounded-collect contract; is typeCol really categorical?")
    // sentinel-collision guard: a REAL event type named like a chain
    // sentinel would silently merge with it (the contentChecksum
    // encoding discipline) — refuse loudly instead. mat can't tell
    // injected sentinels from data ones, so probe the source frame.
    val collisions = events
      .filter(col(typeCol).isin(StartState, ConvState, DropState) &&
        col(typeCol) =!= conversionType)
      .limit(1).count()
    require(collisions == 0L,
      s"markovRemoval: an event type collides with a chain sentinel " +
        s"($StartState/$ConvState/$DropState); rename it upstream")
    val channels = mat.flatMap(t => Seq(t._1, t._2)).distinct
      .filterNot(Set(StartState, ConvState, DropState)).sorted
    // row-normalized probabilities, r6-pinned (the oracle's r6(n/rowsum))
    val rowSums = mat.groupBy(_._1).map { case (f, ts) => f -> ts.map(_._3).sum }
    val probs: Map[(String, String), Double] = mat.map { case (f, t, n) =>
      (f, t) -> r6(n.toDouble / rowSums(f).toDouble)
    }.toMap
    // K forward steps from {START: 1}; DECIMAL(38,6)-exact sums of
    // r6-pinned products, exactly the arithmetic the SQL oracle's
    // staged CTEs perform. d6 recovers the exact 6-decimal rational a
    // SQL DECIMAL cast would (BigDecimal(double) alone would drag the
    // binary representation error into the sums).
    def d6(x: Double): BigDecimal =
      BigDecimal(r6(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def pConv(removed: Option[String]): Double = {
      val transient = channels.filterNot(removed.contains) :+ StartState
      var v: Map[String, BigDecimal] = Map(StartState -> d6(1.0))
      var acc = BigDecimal(0)
      for (_ <- 1 to iters) {
        val absorbed = v.toSeq.map { case (s, p) =>
          d6(p.toDouble * probs.getOrElse((s, ConvState), 0.0))
        }.sum
        acc += absorbed
        v = transient.flatMap { t =>
          val m = v.toSeq.map { case (s, p) =>
            d6(p.toDouble * probs.getOrElse((s, t), 0.0))
          }.sum
          if (m == BigDecimal(0)) None else Some(t -> m)
        }.toMap
      }
      acc.toDouble
    }
    val pFull = r6(pConv(None))
    val out = channels.map { c =>
      val pr = r6(pConv(Some(c)))
      val eff = if (pFull > 0) Some(r6(1.0 - pr / pFull)) else None
      (c, mat.filter(t => t._1 == c || t._2 == c).map(_._3).sum,
        pFull, pr, eff)
    }
    val spark = events.sparkSession
    import spark.implicits._
    out.toSeq.toDF("channel", "n_transitions", "p_full", "p_removed", "removal_effect")
  }
}
