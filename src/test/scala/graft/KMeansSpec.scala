package graft

import graft.functions.Vectors
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  test("kmeans partitions all vectors into k cells deterministically") {
    val (assign1, cents1) = Similarity.kmeans(spark, sf, k = 8, iters = 2)
    val a1 = assign1.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    assert(a1.size == Tables.embeddings(spark, sf).count())
    assert(a1.values.toSet.subsetOf((0 until 8).toSet))
    // deterministic: same result on a second run
    val (assign2, _) = Similarity.kmeans(spark, sf, k = 8, iters = 2)
    val a2 = assign2.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    assert(a1 == a2)
    assert(cents1.collect().forall(_.getAs[Seq[Double]]("centroid").length == 64))
  }

  test("kmeans iterations do not increase within-cluster distance (Lloyd's monotonicity)") {
    def cost(iters: Int): Double = {
      val (assign, cents) = Similarity.kmeans(spark, sf, k = 8, iters = iters)
      Tables.embeddings(spark, sf)
        .join(assign, "vec_id").join(cents, "cell")
        .withColumn("d2", aggregate(
          zip_with(col("embedding"), col("centroid"), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
          lit(0.0), (acc, v) => acc + v))
        .agg(sum("d2")).collect().head.getDouble(0)
    }
    val c1 = cost(1)
    val c3 = cost(3)
    assert(c3 <= c1 + 1e-6, s"cost increased: $c1 -> $c3")
  }

  test("kmeans assignment is a map-side partial aggregate, not a per-vector window") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val asg = Similarity.assignToCells(e, cents, probes = 2)
    val rows = asg.collect()
    assert(rows.length == 2 * Tables.embeddings(spark, sf).count(),
      "every vector must carry exactly `probes` assignments")
    val plan = asg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"assignment must not use a window:\n$plan")
    // partial aggregate BELOW the exchange: Spark prints Partial-mode
    // TopKIds as `partial_top_k_ids` in the map-side ObjectHashAggregate,
    // i.e. the n×k candidate rows are reduced to one bounded-heap
    // partial per vector before any shuffle.
    assert(plan.contains("partial_top_k_ids"),
      s"expected a map-side partial_top_k_ids aggregate before the exchange:\n$plan")
  }

  test("multi-probe assignment ranks cells nearest-first with cell-asc tiebreak") {
    // probes=2 must equal the top-2 rows of the brute-force (d2, cell)
    // ordering per vector — the contract knn_join/dedup_embedding rely on.
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val got = Similarity.assignToCells(e, cents, probes = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rk")) -> r.getAs[Int]("cell")).toMap
    val brute = e.crossJoin(broadcast(cents))
      .withColumn("d2", aggregate(
        zip_with(col("embedding"), col("centroid"), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cell"))))
      .filter(col("rk") <= 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rk")) -> r.getAs[Int]("cell")).toMap
    assert(got == brute)
  }

  test("two-level assignment: exhaustive coarse probing equals flat; 2-probe recall high") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
      .localCheckpoint(true)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rk")) -> r.getAs[Int]("cell")).toMap
    val flat = key(Similarity.assignToCells(e, cents, probes = 2))
    // kc = ceil(√16) = 4: probing all 4 coarse cells makes the fine
    // candidate set exhaustive — the two paths must be row-identical
    val exhaustive = key(Similarity.assignToCellsTwoLevel(e, cents, probes = 2, coarseProbes = 4))
    assert(exhaustive == flat)
    // the public entry dispatches to the two-level path past the
    // threshold (forced tiny here = the big-k regime in miniature)
    val dispatched = key(Similarity.assignToCells(e, cents, probes = 2, twoLevelK = 4))
    val narrow = key(Similarity.assignToCellsTwoLevel(e, cents, probes = 2, coarseProbes = 2))
    assert(dispatched == narrow)
    // coarse-boundary loss: this miniature probes 2 of only 4 coarse
    // cells (half the space — production kc = √k makes 2 probes a far
    // smaller slice with far better recall), so the floor is loose
    val r1flat = flat.collect { case ((v, 1), c) => v -> c }
    val r1nar = narrow.collect { case ((v, 1), c) => v -> c }
    val frac = r1flat.count { case (v, c) => r1nar.get(v).contains(c) }.toDouble / r1flat.size
    assert(frac >= 0.6, s"two-level rank-1 agreement $frac")
  }

  test("bounded cell index caps every cell population at CellBound") {
    val cells = Similarity.boundedCellIndex(spark, sf, probes = 2)
    val pops = cells.groupBy(col("cell")).count().collect().map(_.getLong(1))
    assert(pops.max <= Similarity.CellBound,
      s"max cell population ${pops.max} exceeds bound ${Similarity.CellBound}")
    // splitting refines memberships, never drops them: every vector
    // still carries exactly `probes` cell memberships
    assert(cells.count() == 2 * Tables.embeddings(spark, sf).count())
  }

  test("split round halves oversized cells deterministically and keeps the rest") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val cells = Similarity.assignToCells(e, cents, probes = 1).select(col("vec_id"), col("cell"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toSet
    val bound = 40L
    val once = Similarity.splitOversizedRound(cells, e, bound)
    assert(key(once) == key(Similarity.splitOversizedRound(cells, e, bound)))
    // each original membership maps to exactly one child (2c or 2c+1)
    val parent = key(cells).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    key(once).foreach { case (v, c) => assert(parent(v).contains(c / 2)) }
    // an under-bound input is only id-remapped, never reassigned
    val small = cells.filter(col("cell") === 0)
    val smallOut = key(Similarity.splitOversizedRound(small, e, bound = 1000000L))
    assert(smallOut == key(small).map { case (v, c) => (v, c * 2) })
    // plan shape: the split is hash aggregates + joins end to end — no
    // per-cell Window sorting the hottest cell on one task
    val plan = once.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"split round must not use a window:\n$plan")
  }

  test("incremental index merge equals a fresh rebuild against the same codebook") {
    // The incremental contract (the vector twin of dedup_incremental's):
    // assigning the batch to the EXISTING centroids and appending must
    // produce the byte-identical index a full re-assignment of every
    // vector against that codebook would — merge loses nothing vs
    // rebuild. (A rebuild that also re-derives the codebook from
    // corpus+batch legitimately drifts; the stored-codebook index is
    // the thing being maintained.)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val k = Similarity.cellCount(corpus.count())
    val (corpusCells, cents) = Similarity.kmeansOn(corpus, k = k, iters = 1, probes = 1)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val merged = asMap(corpusCells.select(col("vec_id"), col("cell"))) ++
      asMap(Similarity.assignToCells(batch, cents, probes = 1))
    val rebuilt = asMap(Similarity.assignToCells(e, cents, probes = 1))
    assert(merged == rebuilt)
    assert(merged.size == e.count())
  }

  test("resplitOversized splits only oversized cells, preserves membership, bounds children") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    // k=4 forces large cells so a bound at half the max population
    // guarantees at least one split
    val (cells0, cents) = Similarity.kmeansOn(e, k = 4, iters = 1, probes = 1)
    val cells = cells0.select(col("vec_id"), col("cell"))
    val pops = cells.groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("count")).toMap
    val bound = pops.values.max / 2
    assert(pops.values.exists(_ > bound))
    val (nc, ncents) = Similarity.resplitOversized(cells, cents, e, bound)
    val npops = nc.groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("count")).toMap
    val offset = cents.agg(max(col("cell"))).head().getInt(0) + 1
    // membership preserved exactly (no vector lost or duplicated)
    assert(nc.count() == cells.count())
    assert(nc.select(col("vec_id")).distinct().count() == cells.count())
    pops.foreach { case (c, p) =>
      if (p <= bound) assert(npops.get(c).contains(p), s"untouched cell $c changed")
      else {
        val lo = npops.getOrElse(c, 0L)
        val hi = npops.getOrElse(c + offset, 0L)
        assert(lo + hi == p, s"split of cell $c lost members")
        assert(lo > 0 && hi > 0 && lo < p && hi < p, s"split of cell $c degenerate: $lo/$hi")
      }
    }
    // every surviving cell has a centroid, and vice versa
    val centCells = ncents.select(col("cell")).collect().map(_.getInt(0)).toSet
    assert(centCells == npops.keySet)
  }

  test("filtered ANN returns only label-1 vectors, ranked by cosine") {
    val rows = Similarity.annFiltered(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getAs[Int]("label") == 1))
    val cs = rows.map(_.getAs[Double]("cos"))
    assert(cs.sameElements(cs.sortBy(-(_: Double))))
  }

  test("ann_recall reports the measured IVF/brute-force intersection in [0,1]") {
    val r = Similarity.annRecall(spark, sf).collect().head
    val n = r.getAs[Long]("n_common")
    val rec = r.getAs[Double]("recall_at_k")
    assert(n >= 0 && n <= 10)
    assert(math.abs(rec - n / 10.0) < 0.01)
  }

  test("ann_ivfpq ranks by ascending ADC distance and stays within 10 rows") {
    val rows = Similarity.annIvfPq(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ds = rows.map(_.getAs[Double]("adc_d2"))
    assert(ds.sameElements(ds.sorted), s"ADC distances not ascending: ${ds.mkString(",")}")
    // ADC ranking over probed cells should agree substantially with the
    // exact-ranked IVF result (same candidate cells, approximate metric)
    val ivf = Similarity.annIvf(spark, sf).collect().map(_.getAs[Long]("vec_id")).toSet
    val pq = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(ivf.intersect(pq).size >= 3, s"IVFPQ diverges from IVF: $pq vs $ivf")
  }

  test("IVF over kmeans cells recovers most brute-force neighbors (recall)") {
    val (assign, cents) = Similarity.kmeans(spark, sf, k = 8, iters = 2)
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    // brute-force top-10
    val bf = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Vectors.cosine(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // probe the 3 nearest cells
    val qCell = cents.crossJoin(broadcast(q))
      .withColumn("d2", aggregate(
        zip_with(col("qv"), col("centroid"), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, v) => acc + v))
      .orderBy(col("d2")).limit(3).select(col("cell"))
    val ivf = Tables.embeddings(spark, sf).join(assign, "vec_id")
      .join(broadcast(qCell), "cell")
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Vectors.cosine(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = bf.intersect(ivf).size / 10.0
    assert(recall >= 0.3, s"IVF recall too low: $recall (bf=$bf ivf=$ivf)")
  }

  test("persisted IVF layout: probe reads only its two cells' files, result == in-memory probe") {
    val viaDisk = Similarity.annIvfPersisted(spark, sf)
    val viaMem = Similarity.annIvf(spark, sf)
    assert(viaDisk.collect().toSeq == viaMem.collect().toSeq)
    // the written layout holds every cell directory, the probe's scan
    // reads files from exactly the two probed cells
    // derive the root exactly as ivfLayout does — the pre-round-11
    // hard-coded /tmp/graft_ivfindex/<sf>/cells path silently read a
    // STALE leftover layout on long-lived instances and NPEs on a
    // clean one (layouts moved under per-appId roots in round 11)
    val root = s"${graft.sources.IndexCache.layoutRoot(spark, "graft_ivfindex", sf)}/cells"
    val allCells = new java.io.File(root).listFiles().count(_.getName.startsWith("cell="))
    assert(allCells > 2, s"expected many cell dirs, got $allCells")
    val persisted = spark.read.parquet(root)
    val plan = Similarity.annIvfPersisted(spark, sf)
      .queryExecution.executedPlan.toString
    // plan-level: the scan carries the cell partition filter
    assert(plan.contains("cell"), s"no cell predicate in plan:\n$plan")
    val files = persisted
      .filter(col("cell").isin(0, 1))
      .select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f => f.contains("cell=0") || f.contains("cell=1")),
      s"cell probe read outside its partitions:\n${files.mkString("\n")}")
    // write-once per snapshot: re-probing must not rewrite the layout
    val before = new java.io.File(root).lastModified()
    Similarity.annIvfPersisted(spark, sf).collect()
    assert(new java.io.File(root).lastModified() == before,
      "persisted IVF layout was rewritten by a probe")
  }

  test("round 9: every ANN family probe reads the persisted layout with a cell partition filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // build the layouts once so plan construction below is cheap
    Similarity.annIvf(spark, sf).collect()
    Similarity.knnJoin(spark, sf).collect()
    val family = Seq(
      "ann_ivf" -> Similarity.annIvf(spark, sf),
      "ann_ivf_persisted" -> Similarity.annIvfPersisted(spark, sf),
      "ann_ivfpq" -> Similarity.annIvfPq(spark, sf),
      "ann_filtered" -> Similarity.annFiltered(spark, sf),
      "ann_range" -> Similarity.annRange(spark, sf),
      "ann_multiquery" -> Similarity.annMultiQuery(spark, sf),
      "knn_join" -> Similarity.knnJoin(spark, sf))
    for ((name, df) <- family) {
      val scans = df.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("graft_ivfindex")) => s
      }
      assert(scans.nonEmpty, s"$name does not scan the persisted IVF layout")
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.references.exists(_.name == "cell")),
          s"$name scans the layout WITHOUT a cell partition filter:\n$s")
      }
      // and none of them fall back to scanning the corpus assignment
      // frame per probe: the only embeddings.parquet reads allowed are
      // the query-vector / label side lookups, never a full-corpus
      // candidate scan — structurally guaranteed by the layout join,
      // asserted here via the layout scan presence above
    }
  }

  test("range search returns only in-radius vectors from probed cells, high recall vs brute force") {
    import graft.functions.Vectors
    val got = Similarity.annRange(spark, sf).collect()
    assert(got.nonEmpty)
    val cos = got.map(_.getAs[Double]("cos"))
    assert(cos.forall(_ >= 0.25))
    assert(cos.sameElements(cos.sortBy(-_)))
    // brute-force ground truth: every in-radius vector in the corpus
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val truth = e.filter(col("vec_id") =!= 0).crossJoin(q)
      .select(col("vec_id"), round(Vectors.cosine(col("embedding"), col("qv")), 4).as("cos"))
      .filter(col("cos") >= 0.25)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ids = got.map(_.getAs[Long]("vec_id")).toSet
    assert(ids.subsetOf(truth), "range probe returned an out-of-radius vector")
    assert(ids.size >= (truth.size + 1) / 2,
      s"range recall too low: ${ids.size}/${truth.size}")
  }

  test("batched multi-query retrieval: 5 ranked hits per query, query 0 == single-query probe") {
    val rows = Similarity.annMultiQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet.subsetOf((0L until 8L).toSet))
    byQuery.foreach { case (q, rs) =>
      // ranks are contiguous from 1 and ordered by descending cosine
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rs.length.toLong))
      assert(rs.length <= 5)
      val cos = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(cos.sameElements(cos.sortBy(-_)))
      // a query never retrieves itself
      assert(rs.forall(_.getAs[Long]("vec_id") != q))
    }
    // query_id 0 is the single-query operator's query vector: the batch
    // path must produce exactly that probe's top-5 prefix
    val single = Similarity.annIvf(spark, sf).collect().take(5)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq
    val batched = byQuery(0L).sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq
    assert(batched == single, s"batched=$batched single=$single")
  }

  test("embed_pca: unit-norm dominant direction, positive explained variance, Rayleigh consistency") {
    val rows = Similarity.embedPca(spark, sf).collect()
    val d = rows.length
    assert(d == 64, s"expected 64 loadings, got $d")
    val loadings = rows.map(_.getAs[Double]("loading"))
    // v3 is normalized before rounding: ||v||^2 within rounding noise of 1
    val norm2 = loadings.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-2, s"||v||^2 = $norm2")
    val eig = rows.map(_.getAs[Double]("eigval")).distinct
    val share = rows.map(_.getAs[Double]("var_share")).distinct
    assert(eig.length == 1 && share.length == 1)
    // the dominant eigenvalue of a covariance matrix is positive and its
    // variance share lies in (0, 1]; dominance means it beats the mean share
    assert(eig.head > 0.0)
    assert(share.head > 1.0 / 64 && share.head <= 1.0 + 1e-9, s"share ${share.head}")
  }

  test("embed_pca_topk: k unit components, near-orthogonal, non-increasing positive eigenvalues") {
    val rows = Similarity.embedPcaTopK(spark, sf).collect()
    assert(rows.length == Similarity.PcaK * 64, s"got ${rows.length} rows")
    val byComp = rows.groupBy(_.getAs[Int]("comp")).map { case (c, rs) =>
      c -> rs.sortBy(_.getAs[Int]("i")).map(_.getAs[Double]("loading"))
    }
    // each component normalized before rounding
    byComp.foreach { case (c, v) =>
      val n2 = v.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-2, s"component $c ||v||^2 = $n2")
    }
    // deflation makes successive components near-orthogonal (3 power
    // steps are not full convergence, so allow a loose bound)
    for (a <- 1 to Similarity.PcaK; b <- a + 1 to Similarity.PcaK) {
      val dot = byComp(a).zip(byComp(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 0.2, s"components $a,$b not orthogonal: dot = $dot")
    }
    // eigenvalues positive and non-increasing (within rounding noise),
    // component 1 == the rank-1 query's eigenvalue
    val eig = (1 to Similarity.PcaK).map(c =>
      rows.filter(_.getAs[Int]("comp") == c).head.getAs[Double]("eigval"))
    assert(eig.forall(_ > 0.0), s"non-positive eigenvalue: $eig")
    eig.sliding(2).foreach { case Seq(hi, lo) =>
      assert(hi >= lo - 1e-3, s"eigenvalues increased: $eig") }
    val rank1 = Similarity.embedPca(spark, sf).collect().head.getAs[Double]("eigval")
    assert(math.abs(eig.head - rank1) < 1e-9, s"comp 1 eigval ${eig.head} != rank-1 $rank1")
  }

  test("embed_abtt: corrected retrieval matches an independent local ABTT computation") {
    import org.apache.spark.sql.functions.col
    // local reference: same mean/Gram/power-iteration/transform math on
    // the collected corpus — an execution strategy independent of the
    // distributed Gram accumulation and the codegen'd column transform
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val d = all.head._2.length
    val n = all.length
    val mean = Array.tabulate(d)(i => all.map(_._2(i)).sum / n)
    val centered = all.map { case (id, v) => id -> v.indices.map(i => v(i) - mean(i)).toArray }
    val g = Array.ofDim[Double](d, d)
    centered.foreach { case (_, c) =>
      for (i <- 0 until d; j <- 0 until d) g(i)(j) += c(i) * c(j) / n }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to 3) {
      val mv = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
      val nrm = math.sqrt(mv.map(x => x * x).sum)
      v = mv.map(_ / nrm)
    }
    def abtt(c: Array[Double]): Array[Double] = {
      val p = c.indices.map(i => c(i) * v(i)).sum
      c.indices.map(i => c(i) - p * v(i)).toArray
    }
    val q = abtt(centered.find(_._1 == 0L).get._2)
    val qn = math.sqrt(q.map(x => x * x).sum)
    def round4(x: Double) = math.rint((x + 1e-9) * 1e4) / 1e4
    val localTop = centered.filter(_._1 != 0L).map { case (id, c) =>
      val x = abtt(c)
      val xn = math.sqrt(x.map(t => t * t).sum)
      id -> round4(x.indices.map(i => x(i) * q(i)).sum / (xn * qn))
    }.sortBy { case (id, cos) => (-cos, id) }.take(10)

    val got = Similarity.embedAbtt(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_abtt")))
    assert(got.map(_._1).sameElements(localTop.map(_._1)),
      s"ids ${got.map(_._1).toSeq} != local ${localTop.map(_._1).toSeq}")
    got.zip(localTop).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-3, s"cosine $a != local $b") }
  }
}
