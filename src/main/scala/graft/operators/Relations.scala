package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relation-level utilities and the remaining dbt_utils scalar surface:
  * union_relations, pagination, safe_divide, URL parsing, haversine.
  */
object Relations {

  /** dbt_utils `union_relations` (macros/sql/union.sql:5-128): UNION ALL
    * over the column SUPERSET — each relation contributes its own columns,
    * missing ones are null-filled with the type from whichever relation
    * defines them, and a `_source_relation` lineage column records
    * provenance. Column order follows first appearance across inputs.
    */
  def unionRelations(relations: Seq[(String, DataFrame)]): DataFrame = {
    require(relations.nonEmpty, "unionRelations of nothing")
    // The pinned type for each column is the WIDENED common type across
    // every relation that defines it (dbt_utils casts each contribution to
    // the superset type) — first-seen-wins would narrow, e.g. INT before
    // BIGINT would overflow the wider side's values under ANSI.
    def wider(a: org.apache.spark.sql.types.DataType,
              b: org.apache.spark.sql.types.DataType) =
      org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findWiderTypeForTwo(a, b)
        .getOrElse(throw new IllegalArgumentException(
          s"unionRelations: no common type for $a and $b"))
    val superset: Seq[(String, org.apache.spark.sql.types.DataType)] =
      relations.flatMap { case (_, df) => df.schema.map(f => f.name -> f.dataType) }
        .foldLeft(Vector.empty[(String, org.apache.spark.sql.types.DataType)]) {
          case (acc, (n, t)) => acc.indexWhere(_._1 == n) match {
            case -1 => acc :+ (n -> t)
            case i  => acc.updated(i, n -> wider(acc(i)._2, t))
          }
        }
    relations.map { case (name, df) =>
      val present = df.columns.toSet
      df.select(superset.map { case (n, t) =>
        if (present(n)) col(n).cast(t).as(n) else lit(null).cast(t).as(n)
      } :+ lit(name).as("_source_relation"): _*)
    }.reduce(_.unionByName(_))
  }

  /** Keyset-free pagination (services/catalog/app/api/products.py:20-34):
    * a total order (tiebroken by the caller's sort columns) + offset/limit.
    * Spark plans this as a global sort + skip — fine for page-sized
    * offsets; deep pagination should switch to a keyset predicate.
    */
  def paginate(df: DataFrame, sortCols: Seq[Column], offset: Int, limit: Int): DataFrame =
    df.orderBy(sortCols: _*).offset(offset).limit(limit)

  /** Case-insensitive contains — the reference's `ILIKE '%term%'` filter
    * (services/catalog/app/api/products.py:28-29). `lower` on both sides
    * keeps the predicate codegen'd and sargable enough to push to the scan.
    */
  def ilikeContains(c: Column, term: String): Column =
    lower(c).contains(term.toLowerCase(java.util.Locale.ROOT))

  /** dbt_utils `safe_divide`: null (not an error) on zero/null denominator. */
  def safeDivide(num: Column, den: Column): Column = num / nullif(den, lit(0))

  /** Skew-safe inner equi-join: the skewed fact side gets a deterministic
    * per-row salt (hash of the whole row), the small side is replicated
    * `saltFactor` ways, and the join key becomes (key, salt) — one hot key
    * spreads over `saltFactor` reducers instead of melting one executor.
    *
    * AQE's skew-join splitting is the first line of defense (enabled in
    * GraftSession); explicit salting is for the case AQE can't fix —
    * a single key too large for any one task even after partition splits.
    * Result rows are exactly those of the plain inner join.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toSeq: _*)), lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Range (interval) join without a theta join: `fact.valueCol` against
    * `[lo, hi)` ranges. Spark plans `v >= lo AND v < hi` as a broadcast
    * nested loop — O(|fact|·|ranges|) comparisons, a non-starter when the
    * range table outgrows a few hundred rows. Instead each range is
    * replicated into every fixed-width bucket it covers and the fact row
    * equi-joins on its single bucket `floor(v / w)`, then the exact
    * predicate filters within the bucket. Each matching (row, range) pair
    * appears exactly once (a value has one bucket; covered buckets are
    * distinct), so no dedup pass is needed.
    *
    * Choose `bucketWidth` near the typical range width so replication stays
    * O(1–100) per range; the join is a plain (broadcastable) equi-join and
    * survives any fact-side scale. A range spanning more than
    * `maxBucketsPerRange` buckets fails fast with a clear message instead
    * of materializing an enormous per-row replication array (Spark's
    * `sequence` errors past 2^31 elements, and executor memory dies well
    * before) — widen `bucketWidth` or split the range.
    */
  def rangeJoinBucketed(fact: DataFrame, valueCol: String, ranges: DataFrame,
                        lo: String, hi: String, bucketWidth: Double,
                        maxBucketsPerRange: Int = 100000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerRange > 0, "maxBucketsPerRange must be positive")
    val loB = floor(col(lo) / bucketWidth)
    val hiBRaw = floor(col(hi) / bucketWidth)
    val hiB = when(hiBRaw - loB >= lit(maxBucketsPerRange.toLong),
      raise_error(format_string(
        s"rangeJoinBucketed: range [%s, %s) spans %s buckets of width " +
          s"$bucketWidth (max $maxBucketsPerRange) — widen bucketWidth " +
          "or split the range",
        col(lo), col(hi), hiBRaw - loB + lit(1L)))).otherwise(hiBRaw)
    val rb = ranges.withColumn("__b", explode(sequence(loB, hiB)))
    fact.withColumn("__b", floor(col(valueCol) / bucketWidth))
      .join(rb, Seq("__b"))
      .where(col(valueCol) >= col(lo) && col(valueCol) < col(hi))
      .drop("__b")
  }

  /** dbt_utils `safe_add` / `safe_subtract`: null-as-zero element
    * arithmetic that still yields null when EVERY operand is null.
    */
  def safeAdd(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ && _), lit(null))
      .otherwise(cols.map(coalesce(_, lit(0))).reduce(_ + _))

  def safeSubtract(a: Column, b: Column): Column =
    when(a.isNull && b.isNull, lit(null))
      .otherwise(coalesce(a, lit(0)) - coalesce(b, lit(0)))

  /** dbt_utils URL helpers (macros/web/get_url_host.sql:5-27 etc.) via
    * Spark's codegen'd parse_url.
    */
  def urlHost(url: Column): Column = parse_url(url, lit("HOST"))
  def urlPath(url: Column): Column = parse_url(url, lit("PATH"))
  def urlParameter(url: Column, name: String): Column =
    parse_url(url, lit("QUERY"), lit(name))

  /** URL canonicalization — the crawl-dedup prestage (the same page
    * arrives as `HTTP://Example.COM/a/`, `https://example.com/a?utm_…`,
    * and `https://example.com/a` — raw-string dedup misses all three):
    * lowercase the host, strip the scheme and trailing path slash, drop
    * tracking parameters (utm_*, gclid, fbclid), and SORT the surviving
    * query parameters so order never splits a group. Built entirely from
    * regexp extraction + array HOFs that DuckDB replays verbatim
    * (list_filter/list_sort/array_to_string), so canonical-URL dedup
    * stays hash-gated (q232). Row-local and codegen-friendly; NULL in →
    * NULL out.
    */
  def canonicalizeUrl(u: Column): Column = {
    val host = lower(regexp_extract(u, "^[A-Za-z]+://([^/?#]+)", 1))
    val path = regexp_extract(u, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("gclid=") &&
        !p.startsWith("fbclid="))
    val sortedQ = array_join(sort_array(params), "&")
    when(u.isNull, lit(null).cast("string")).otherwise(
      concat(host, rtrim(path, "/"),
        when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))))
  }

  /** dbt_utils `haversine_distance` (macros/sql/haversine_distance.sql:17-29),
    * great-circle km from degree coordinates — all codegen'd built-ins.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** Geo radius join — all (a, b) pairs within `radiusKm` great-circle
    * km, via GRID BUCKETING (the standard spatial-join prestage): each
    * point lands in a lat/lon cell sized ≥ the radius in both axes, side
    * a fans out to its 3×3 neighborhood, and candidates meet in an
    * EQUI-join on the cell key before the exact [[haversineKm]] filter.
    * Complete by construction inside the latitude band: a neighbor
    * within R differs by ≤ R/111.045 lat-degrees (≤ one lat cell) and ≤
    * R/(111.045·cos(maxAbsLat)) lon-degrees (≤ one lon cell, since lon
    * degrees only shrink toward the poles); lon cells are MODULAR so
    * antimeridian-straddling pairs are found (−179.9° and +179.9° are
    * 0.2° apart) — spec-asserted against the brute-force join, seam
    * included. Rows beyond ±maxAbsLat are dropped (the lon-cell
    * bound no longer holds there; polar work wants a different
    * projection), the documented band contract.
    *
    * Scale posture: one 9× fanout on side a, one equi-shuffle, row-local
    * trig — never a cartesian plan node; each pair meets in exactly one
    * cell (b sits in one cell, a's neighborhood covers it once), so no
    * dedup pass. The km output carries the q34 `round(_, 3)` libm
    * contract.
    *
    * Output: (idA, idB, km).
    */
  def geoRadiusJoin(a: DataFrame, b: DataFrame, idA: String, idB: String,
                    radiusKm: Double, maxAbsLat: Double = 60.0): DataFrame = {
    require(radiusKm > 0, s"geoRadiusJoin: radiusKm > 0, got $radiusKm")
    require(maxAbsLat > 0 && maxAbsLat <= 80,
      s"geoRadiusJoin: maxAbsLat in (0, 80], got $maxAbsLat")
    val latCell = radiusKm / 111.045
    // Longitude cells are MODULAR: the haversine treats −179.9° and
    // +179.9° as 0.2° apart (sine periodicity), so the grid must too —
    // without wraparound every antimeridian-straddling pair is silently
    // missed. Cell count divides 360 exactly so cells are uniform and
    // "within one cell width" always means "within one cell index";
    // max(3) keeps the 3-neighborhood well-defined even for huge radii
    // (3 cells of 120° degrade toward all-pairs, still correct).
    val lonCellMin = radiusKm / (111.045 * math.cos(math.toRadians(maxAbsLat)))
    val nLonCells = math.max(3L, math.floor(360.0 / lonCellMin).toLong)
    val lonCell = 360.0 / nLonCells
    // Internal aliases on BOTH id columns (the maxDrawdown lesson): a
    // self-join with idA == idB must not hit an ambiguous reference.
    def cells(df: DataFrame, id: String, pfx: String) =
      df.filter(abs(col("lat")) <= maxAbsLat)
        .select(col(id).as(s"${pfx}id"), col("lat").as(s"${pfx}lat"),
          col("lon").as(s"${pfx}lon"),
          floor(col("lat") / latCell).cast("long").as(s"${pfx}cx"),
          pmod(floor((col("lon") + 180.0) / lonCell).cast("long"),
            lit(nLonCells)).as(s"${pfx}cy"))
    val an = cells(a, idA, "__a_")
      .withColumn("__d", explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)))
      .select(col("__a_id"), col("__a_lat"), col("__a_lon"),
        (col("__a_cx") + col("__d.dx")).as("cx"),
        pmod(col("__a_cy") + col("__d.dy"), lit(nLonCells)).as("cy"))
    val bn = cells(b, idB, "__b_")
      .select(col("__b_id"), col("__b_lat"), col("__b_lon"),
        col("__b_cx").as("cx"), col("__b_cy").as("cy"))
    an.join(bn, Seq("cx", "cy"))
      .withColumn("km",
        round(haversineKm(col("__a_lat"), col("__a_lon"), col("__b_lat"),
          col("__b_lon")), 3))
      .filter(col("km") <= radiusKm)
      .select(col("__a_id").as(idA), col("__b_id").as(idB), col("km"))
  }
}
