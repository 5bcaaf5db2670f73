package graft.streaming

import org.apache.spark.sql.SparkSession

/** PIN-AWARE RETENTION for generation-family state artifacts — the GC face
  * of the version axis. The generation states are APPEND-ONLY (curation
  * selections `selection/s<b>`, quantizer generations `qg<b>`): every
  * horizon read resolves to the newest generation at or below it, so the
  * generations strictly below the one serving the oldest horizon anyone
  * can still name are dead weight. At 100 TB that weight is corpus-sized —
  * each selection generation is a full copy of the served id set; a
  * year of drift-triggered firings is a year of copies — so retention is
  * a first-class maintenance op, not a shell script.
  *
  * [[vacuumSelections]] / [[vacuumQuantizers]] drop every generation
  * SUPERSEDED at the retention floor: the newest generation ≤ floor is
  * KEPT (it serves every horizon in [floor, next generation)), so no
  * read at or above the floor changes — hash-equal before and after,
  * which is what the p_retention gates pin.
  *
  * The floor is the caller's `keepFrom` LOWERED to the oldest horizon any
  * supplied [[SnapshotManifest]] pins on the same state dir: a pin is a
  * durable promise that horizon stays serveable (the seal contract
  * [[SnapshotManifest.verify]] audits), so a vacuum can never break a
  * pinned training-run version. A manifest dir that does not exist FAILS
  * the vacuum (through [[SnapshotManifest.pins]]'s own error) — deleting
  * history because the pin file was misplaced is the disaster case, so
  * the job is fail-safe, never fail-open.
  *
  * Reads BELOW the floor fail with an explicit retention error, never
  * silently-wrong history: the vacuum leaves a `_retfloor` marker (text
  * file, temp-write + rename, floors only ever rise) that
  * [[CurateMaintainer.selectionAsOf]] / [[AnnIndexMaintainer.centroidsAsOf]]
  * consult when no generation resolves — the reader then reports "below
  * the retention floor" instead of the misleading "state never fired".
  * Crash discipline: the marker commits BEFORE any generation is dropped,
  * so a crash mid-vacuum leaves readers already told why below-floor
  * horizons are gone, and a re-run completes the drop idempotently.
  *
  * The reference has no version axis at all (its models are overwritten
  * in place — recathon.c's UPDATE of the recathonmodels catalog row);
  * retention is part of the beyond-reference lifecycle surface.
  */
object Retention {

  private[streaming] def selectionMarker(stateDir: String): String =
    new java.io.File(new java.io.File(stateDir, "selection"),
      "_retfloor").getPath

  private[streaming] def quantizerMarker(indexDir: String): String =
    new java.io.File(indexDir, "_qg_retfloor").getPath

  /** The committed retention floor, if a vacuum ever ran here. */
  def readFloor(markerPath: String): Option[Long] = {
    val f = new java.io.File(markerPath)
    if (!f.isFile) None
    else {
      val src = scala.io.Source.fromFile(f)
      try Some(src.mkString.trim.toLong) finally src.close()
    }
  }

  /** Floors only rise: a later vacuum with a lower effective floor (more
    * pins) drops nothing new and must not UNDERSTATE what an earlier
    * vacuum already removed. */
  private def writeFloor(markerPath: String, floor: Long): Unit = {
    val committed = readFloor(markerPath).getOrElse(Long.MinValue)
    if (floor > committed) {
      val tmp = new java.io.File(markerPath + ".tmp")
      graft.Exec.deletePath(tmp.getPath)
      val w = new java.io.PrintWriter(tmp)
      try w.print(floor.toString) finally w.close()
      val dest = new java.io.File(markerPath)
      graft.Exec.deletePath(dest.getPath) // single-file swap; tmp is complete
      require(tmp.renameTo(dest), s"retention marker commit failed: $dest")
    }
  }

  private[streaming] def selectionPolicyPath(stateDir: String): String =
    new java.io.File(new java.io.File(stateDir, "selection"),
      "_retpolicy").getPath

  private[streaming] def quantizerPolicyPath(indexDir: String): String =
    new java.io.File(indexDir, "_qg_retpolicy").getPath

  /** Persist a retention POLICY on the state itself: every vacuum of
    * this state keeps (at least) the newest `keepLast` generations —
    * the operator configures the state once and the planner sweep
    * ([[MaintenancePlanner.RetentionSpec]] with no `keepFrom`) needs no
    * per-spec knobs thereafter. Pins still lower the floor further; an
    * explicit `keepFrom` below the policy floor still wins (both only
    * ever KEEP more). Temp-write + rename like every marker. */
  def setSelectionPolicy(stateDir: String, keepLast: Int): Unit =
    writePolicy(selectionPolicyPath(stateDir), keepLast)

  /** [[setSelectionPolicy]] for an ANN state's quantizer + codebook
    * generation families (one policy governs both — they retire
    * together at one floor). */
  def setQuantizerPolicy(indexDir: String, keepLast: Int): Unit =
    writePolicy(quantizerPolicyPath(indexDir), keepLast)

  private def writePolicy(path: String, keepLast: Int): Unit = {
    require(keepLast >= 1,
      s"retention policy must keep at least 1 generation, got $keepLast")
    val tmp = new java.io.File(path + ".tmp")
    graft.Exec.deletePath(tmp.getPath)
    val w = new java.io.PrintWriter(tmp)
    try w.print(s"keepLast=$keepLast") finally w.close()
    val dest = new java.io.File(path)
    graft.Exec.deletePath(dest.getPath)
    require(tmp.renameTo(dest), s"retention policy commit failed: $dest")
  }

  def readPolicy(path: String): Option[Int] = {
    val f = new java.io.File(path)
    if (!f.isFile) None
    else {
      val src = scala.io.Source.fromFile(f)
      try Some(src.mkString.trim.stripPrefix("keepLast=").toInt)
      finally src.close()
    }
  }

  /** The floor the state's own policy implies for one generation family:
    * the id of the keepLast-th-newest generation (everything strictly
    * below its server drops), or the oldest id when there are not yet
    * that many (nothing drops), or no constraint without a policy. */
  private def policyFloor(gensDir: String, prefix: String,
      policyPath: String): Option[Long] =
    readPolicy(policyPath).flatMap { keepLast =>
      val gens = BatchDirs.listDirs(gensDir, prefix)
      if (gens.isEmpty) None
      else if (gens.size <= keepLast) Some(gens.head._1)
      else Some(gens(gens.size - keepLast)._1)
    }

  /** `keepFrom` lowered to the oldest horizon any supplied manifest pins
    * on `stateDir` with one of the `kinds` — the effective retention
    * floor. Paths compare canonically (a pin written with a relative or
    * symlinked path still protects the state). */
  private[streaming] def floorFor(spark: SparkSession, stateDir: String,
      keepFrom: Long, manifestDirs: Seq[String],
      kinds: Set[String]): Long = {
    val canon = new java.io.File(stateDir).getCanonicalPath
    val pinned = manifestDirs
      .flatMap(m => SnapshotManifest.pins(spark, m))
      .filter(p => kinds.contains(p.kind) &&
        new java.io.File(p.dir).getCanonicalPath == canon)
      .map(_.asOf)
    (keepFrom +: pinned).min
  }

  /** The generations a vacuum at `floor` would drop: everything strictly
    * below the one SERVING the floor (which stays — it answers every
    * horizon in [floor, next generation)). */
  private def staleGens(gensDir: String, prefix: String,
      floor: Long): Seq[(Long, String)] = {
    val gens = BatchDirs.listDirs(gensDir, prefix)
    gens.filter(_._1 <= floor).lastOption
      .toSeq.flatMap(sv => gens.filter(_._1 < sv._1))
  }

  /** Drop the generations strictly below the one serving `floor`; commit
    * the floor marker first. Returns the dropped generation ids. */
  private def vacuumGens(gensDir: String, prefix: String, floor: Long,
      markerPath: String): Seq[Long] = {
    val drop = staleGens(gensDir, prefix, floor)
    if (drop.nonEmpty) {
      writeFloor(markerPath, floor)
      drop.foreach(g => graft.Exec.deletePath(g._2))
    }
    drop.map(_._1)
  }

  /** The selection family's effective floor: keepFrom ∧ pins ∧ the
    * state's own persisted policy. */
  private def selectionFloor(spark: SparkSession, stateDir: String,
      keepFrom: Long, manifestDirs: Seq[String]): Long = {
    val base = floorFor(spark, stateDir, keepFrom, manifestDirs,
      Set("curate"))
    policyFloor(new java.io.File(stateDir, "selection").getPath, "s",
      selectionPolicyPath(stateDir)).fold(base)(math.min(base, _))
  }

  private def quantizerFloor(spark: SparkSession, indexDir: String,
      keepFrom: Long, manifestDirs: Seq[String],
      prefix: String): Long = {
    val base = floorFor(spark, indexDir, keepFrom, manifestDirs,
      Set("quantizer", "codebook", "ann"))
    policyFloor(indexDir, prefix, quantizerPolicyPath(indexDir))
      .fold(base)(math.min(base, _))
  }

  /** DRY RUN of [[vacuumSelections]]: the superseded generation ids a
    * vacuum with these parameters would drop, measured the same
    * pin-and-policy-aware way — the planner's retention metric
    * (metadata-cost: a dir listing plus the manifest reads). */
  def staleSelections(spark: SparkSession, stateDir: String,
      keepFrom: Long = Long.MaxValue,
      manifestDirs: Seq[String] = Nil): Seq[Long] =
    staleGens(new java.io.File(stateDir, "selection").getPath, "s",
      selectionFloor(spark, stateDir, keepFrom, manifestDirs))
      .map(_._1)

  /** DRY RUN of [[vacuumQuantizers]] (quantizer + codebook families). */
  def staleQuantizers(spark: SparkSession, indexDir: String,
      keepFrom: Long = Long.MaxValue,
      manifestDirs: Seq[String] = Nil): Seq[Long] =
    (staleGens(indexDir, "qg",
        quantizerFloor(spark, indexDir, keepFrom, manifestDirs, "qg")) ++
      staleGens(indexDir, "cbg",
        quantizerFloor(spark, indexDir, keepFrom, manifestDirs, "cbg")))
      .map(_._1)

  /** Vacuum a curation state's selection generations. Pins of kind
    * `curate` on this state dir hold the floor down, as does the state's
    * persisted [[setSelectionPolicy]] window. */
  def vacuumSelections(spark: SparkSession, stateDir: String,
      keepFrom: Long = Long.MaxValue,
      manifestDirs: Seq[String] = Nil): Seq[Long] =
    vacuumGens(new java.io.File(stateDir, "selection").getPath, "s",
      selectionFloor(spark, stateDir, keepFrom, manifestDirs),
      selectionMarker(stateDir))

  /** Vacuum an ANN state's quantizer generations (`qg<b>/`) AND its
    * codebook generations (`cbg<b>/`, when the state is PQ-coded) at the
    * same floor. Pins of kind `quantizer`, `codebook` OR `ann` on this
    * index dir hold the floor down — a pinned row horizon implies the
    * reproducibility audit will also ask for the quantizer/codebooks
    * serving then ([[AnnIndexMaintainer.centroidsAsOf]] /
    * [[AnnIndexMaintainer.codebooksAsOf]]), so all three kinds protect
    * the generations. The index ROWS are untouched: batch/growth dirs
    * carry live data at every horizon and belong to the compaction/seal
    * lifecycle, not generation retention. */
  def vacuumQuantizers(spark: SparkSession, indexDir: String,
      keepFrom: Long = Long.MaxValue,
      manifestDirs: Seq[String] = Nil): Seq[Long] = {
    val marker = quantizerMarker(indexDir)
    vacuumGens(indexDir, "qg",
      quantizerFloor(spark, indexDir, keepFrom, manifestDirs, "qg"),
      marker) ++
      vacuumGens(indexDir, "cbg",
        quantizerFloor(spark, indexDir, keepFrom, manifestDirs, "cbg"),
        marker)
  }

  /** RETIRE a superseded state generation DIRECTORY wholesale — the
    * inter-directory face of retention: [[AnnIndexMaintainer.retrain]] /
    * [[AnnIndexMaintainer.retrainPq]] rebuild into a NEW dir and leave
    * the previous generation readable for deep horizons; once no
    * manifest pins it, that whole dir is dead weight (at 100 TB, a full
    * index copy). If ANY pin in ANY supplied manifest references the dir
    * — any kind, any horizon — the retirement is REFUSED naming the
    * holder: a pinned generation must stay serveable. Same fail-safe
    * rule as the vacuums: a missing manifest dir fails the call rather
    * than widening what may be deleted. */
  def retireState(spark: SparkSession, stateDir: String,
      manifestDirs: Seq[String]): Unit = {
    val canon = new java.io.File(stateDir).getCanonicalPath
    val holders = manifestDirs.flatMap(m =>
      SnapshotManifest.pins(spark, m)
        .filter(p => new java.io.File(p.dir).getCanonicalPath == canon)
        .map(p => s"$m (state '${p.state}', as of ${p.asOf})"))
    require(holders.isEmpty,
      s"retireState: $stateDir is pinned by ${holders.mkString("; ")} — " +
        "a pinned generation must stay serveable")
    graft.Exec.deletePath(stateDir)
  }

  /** The reader-side error hook: when no generation resolves at `asOf`,
    * report the retention floor if one explains it; otherwise fall back
    * to the state's own "never fired at that horizon" message. */
  private[streaming] def belowFloorMsg(markerPath: String, asOf: Long,
      what: String): Option[String] =
    readFloor(markerPath).filter(_ > asOf).map(floor =>
      s"$what at batch $asOf is below the retention floor $floor " +
        "(generations vacuumed; pin horizons in a SnapshotManifest " +
        "BEFORE vacuuming to keep them serveable)")
}
