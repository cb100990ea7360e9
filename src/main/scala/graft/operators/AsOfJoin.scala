package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the nearest right row at-or-before
  * (backward) or at-or-after (forward) its timestamp on the same
  * key(s) — the time-alignment operator Spark lacks natively
  * (financial ticks, CDC snapshot alignment, feature-at-event-time
  * joins). Key equality follows the reference's join constraint shape
  * (AND of column equalities, dozer-sql join/factory.rs:193-234) plus
  * the time bound its TTL'd incremental join implies.
  *
  * Implementation is the scalable sort-based composition (preference
  * order (a) of the custom-operator guidance): tag and union both
  * sides, one hash shuffle on the key, one per-partition sort on
  * (ts, side), then a running `last(right, ignoreNulls)` window carries
  * the nearest right image onto each left row. O(n log n) per key
  * group, no range self-join blowup; skew handling falls out of AQE on
  * the single exchange.
  *
  * Ties: right rows at the same (key, ts) resolve by sort order —
  * pre-deduplicate the right side (e.g. max_by) for deterministic
  * output.
  */
object AsOfJoin {

  /** Single-key backward-inclusive as-of join (the DuckDB
    * `ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts` semantics).
    */
  def asofJoin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightSuffix: String = ""): DataFrame =
    asofJoinMulti(left, Seq(leftKey), leftTs, right, Seq(rightKey), rightTs,
      rightSuffix = rightSuffix)

  /** General form: compound equality keys, `direction` "backward"
    * (latest right at-or-before left, the default) or "forward"
    * (earliest right at-or-after left), and `allowExactMatches`
    * (false = strictly before/after, pandas merge_asof semantics).
    */
  def asofJoinMulti(
      left: DataFrame, leftKeys: Seq[String], leftTs: String,
      right: DataFrame, rightKeys: Seq[String], rightTs: String,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      rightSuffix: String = ""): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "leftKeys and rightKeys must be non-empty and the same length")
    val backward = direction.toLowerCase match {
      case "backward" => true
      case "forward"  => false
      case other => throw new IllegalArgumentException(
        s"direction must be backward|forward, got '$other'")
    }
    // Flattening both sides into one row demands unambiguous names:
    // shared columns (typically the key/ts themselves) must either not
    // exist or be disambiguated by suffixing the right side.
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty || rightSuffix.nonEmpty,
      s"left and right share columns ${overlap.mkString(", ")}; " +
        "pass rightSuffix to disambiguate the right-side output columns")
    requireSuffixFree(left, right, overlap, rightSuffix)
    val rightType = StructType(right.schema.fields)
    val keyCols = leftKeys.indices.map(i => s"__k$i")
    val l = left.select(
      leftKeys.zip(keyCols).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"),
        lit(1).as("__is_left"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
        lit(null).cast(rightType).as("__r")): _*)
    val r = right.select(
      rightKeys.zip(keyCols).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(rightTs).cast("timestamp").as("__ts"),
        lit(0).as("__is_left"),
        lit(null).cast(StructType(left.schema.fields)).as("__l"),
        struct(right.columns.toIndexedSeq.map(col): _*).as("__r")): _*)
    // Backward scans ascending with a trailing window; forward is the
    // mirror image (descending scan = "next right" carried backward).
    // Tie handling at equal ts is direction-independent: a right row is
    // visible to an equal-ts left row iff it sorts before it, so
    // inclusive puts rights first, strict puts lefts first.
    val tsOrder = if (backward) col("__ts").asc else col("__ts").desc
    val sideOrder =
      if (allowExactMatches) col("__is_left").asc else col("__is_left").desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(
        left.columns.toIndexedSeq.map(c => col("__l").getField(c).as(c)) ++
        right.columns.map(c => col("__match").getField(c)
          .as(if (overlap(c)) c + rightSuffix else c)): _*)
  }

  /** The suffixed right columns must not collide with any other output
    * column, or the flattened frame would be ambiguous again.
    */
  private def requireSuffixFree(left: DataFrame, right: DataFrame,
      overlap: Set[String], rightSuffix: String): Unit = {
    val rightOut = right.columns.map(c =>
      if (overlap(c)) c + rightSuffix else c)
    val clash = (left.columns ++ rightOut)
      .groupBy(identity).collect { case (n, hits) if hits.length > 1 => n }
    require(clash.isEmpty,
      s"suffixed output would still be ambiguous for ${clash.mkString(", ")}; " +
        "pick a different rightSuffix")
  }

  /** Broadcast variant for a small right side (dimension history,
    * quote book, config timeline): the right side is collected, sorted
    * per key, and broadcast; each left row binary-searches the latest
    * right row at-or-before its timestamp. The left side is NEVER
    * shuffled or sorted — at 100 TB of fact rows against a
    * few-million-row history this replaces the sort-based plan's
    * exchange+sort with a map-only stage, the same trade as a
    * broadcast hash join. Backward-inclusive semantics matching
    * [[asofJoin]], including NULL keys grouping together; right rows
    * with a NULL timestamp are ignored (the sort-based plan instead
    * sorts them first, where they can match every left row — a shape
    * that only arises from malformed history tables).
    */
  def asofJoinBroadcast(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightSuffix: String = ""): DataFrame = {
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty || rightSuffix.nonEmpty,
      s"left and right share columns ${overlap.mkString(", ")}; " +
        "pass rightSuffix to disambiguate the right-side output columns")
    requireSuffixFree(left, right, overlap, rightSuffix)
    val spark = left.sparkSession

    // µs-precision epoch for the search key (Timestamp.getTime is ms;
    // getNanos carries the sub-ms part — floor getTime to seconds first
    // so the ms fraction is not double-counted)
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    // NULL keys form an ordinary group, matching the sort-based
    // variant's Window.partitionBy semantics; the sentinel keeps them
    // addressable in the string-keyed index and join
    val nullKey = "\u0000__graft_null_key__"
    // The index is string-keyed while the sort-based variant groups by
    // VALUE equality — normalize floating keys (+0.0 collapses -0.0
    // into 0.0) so keys that compare equal also stringify equal.
    def floating(df: DataFrame, name: String): Boolean =
      df.schema(name).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
    def keyStr(c: Column, isFloating: Boolean): Column = {
      val normalized = if (isFloating) c + lit(0.0) else c
      coalesce(normalized.cast("string"), lit(nullKey))
    }
    val rightKeyStr = keyStr(col(rightKey), floating(right, rightKey))
    val leftKeyStr = keyStr(col(leftKey), floating(left, leftKey))

    // Guard the driver-side collect: this variant is for a SMALL right
    // side (dimension history); an accidentally-large one must fail
    // with a message, not an OOM. Mirrors Spark's broadcast-threshold
    // idea, expressed in rows. The guard is folded into the index
    // collect itself (limit cap+1 on the 2-column projection) so the
    // right side is scanned once for probe+index, not twice.
    val maxRows = spark.conf
      .getOption("spark.graft.asof.broadcastMaxRows")
      .map(_.toLong).getOrElse(5000000L)
    val capped = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
    val indexRows = right.select(rightKeyStr.as("__k"),
      col(rightTs).cast("timestamp").as("__ts"))
      .limit(capped)
      .collect()
    require(indexRows.length <= maxRows,
      s"asofJoinBroadcast right side exceeds $maxRows rows " +
        "(spark.graft.asof.broadcastMaxRows); use the sort-based " +
        "asofJoin/asofJoinMulti for a large right side")

    // driver-side sorted-timestamp index per (stringified) key
    val index: Map[String, Array[Long]] =
      indexRows
        .filter(r => !r.isNullAt(1))
        .groupBy(_.getString(0))
        .map { case (k, rows) =>
          k -> rows.map(r => micros(r.getTimestamp(1))).sorted
        }
    val bc = spark.sparkContext.broadcast(index)

    // 1-based rank of the matched right row (aligns with row_number)
    val lookup = udf((k: String, ts: java.sql.Timestamp) => {
      if (ts == null) null
      else bc.value.get(k) match {
        case None => null
        case Some(times) =>
          val target = micros(ts)
          var lo = 0; var hi = times.length - 1; var best = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (times(mid) <= target) { best = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          if (best < 0) null else java.lang.Integer.valueOf(best + 1)
      }
    })

    val idxWindow = Window.partitionBy(rightKeyStr)
      .orderBy(col(rightTs).cast("timestamp").asc)
    // NULL-ts rows are excluded from the driver index, so they must be
    // excluded from the ranking too — otherwise row_number (nulls
    // first) shifts every rank off the index by one and the join
    // fetches the wrong right image
    val rightIndexed = right
      .filter(col(rightTs).cast("timestamp").isNotNull)
      .withColumn("__rk", rightKeyStr)
      .withColumn("__ridx", row_number().over(idxWindow))
    val renamedRight = right.columns.foldLeft(rightIndexed) { (df, c) =>
      if (overlap(c)) df.withColumnRenamed(c, c + rightSuffix) else df
    }

    // map-only on the left: index lookup, then a broadcast hash join
    // fetches the matched right image — no exchange or sort of `left`
    left
      .withColumn("__lk", leftKeyStr)
      .withColumn("__lidx",
        lookup(col("__lk"), col(leftTs).cast("timestamp")))
      .join(broadcast(renamedRight),
        col("__lk") === col("__rk") && col("__lidx") === col("__ridx"),
        "left")
      .drop("__lk", "__lidx", "__rk", "__ridx")
  }
}
