package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Consumer-side install daemon — the analog of the reference server's
 * incremental download/install loop (`IndexBuilder.java:154-203`: poll a
 * work dir, skip in-flight producers, verify what arrived, install it, mark
 * it done so a restart never re-installs). Composes this engine's existing
 * consumer pieces into the one loop an operator runs:
 *
 *   poll `incomingDir` -> for each READY bundle (has manifest.json — the
 *   producer's "completed" record — and no `_STARTED` in-flight marker):
 *     1. [[BundleValidate]]: counts/files/bytes/placement vs manifest +
 *        shard_state.json (a tampered or half-copied bundle cannot pass)
 *     2. optional [[BundleCompact]]: many small producer files -> one per
 *        shard (the forceMerge-before-serve analog)
 *     3. install = atomic rename into `installDir` (same-filesystem move,
 *        like the reference's rename-into-place), then `_INSTALLED` marker
 *   invalid bundles get `_INVALID` (with the problem list) and are left in
 *   place for inspection — never installed, never retried silently.
 *
 * The loop stops when `incomingDir/_COMPLETE` exists and no ready bundles
 * remain (the reference's external completion marker), or at `timeoutMs`.
 * Driver-side orchestration only; the per-bundle verification/compaction
 * work inside is distributed Spark jobs.
 */
object BundleInstall {

  sealed trait Outcome { def bundle: String }
  case class Installed(bundle: String, docs: Long, compacted: Boolean) extends Outcome
  case class Invalid(bundle: String, problems: Seq[String]) extends Outcome
  case class Skipped(bundle: String, reason: String) extends Outcome

  /** One poll pass: examine every subdirectory of `incomingDir`, install
    * the ready+valid ones, mark the broken ones. Idempotent: installed and
    * invalid bundles are marker-skipped on re-runs. */
  def installOnce(spark: SparkSession, incomingDir: String, installDir: String,
                  compact: Boolean = false): Seq[Outcome] = {
    val fs = FileSystem.get(new java.net.URI(incomingDir),
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(installDir))
    // heal sweep over the install root FIRST: a crash between a bundle's
    // rename and its finalize leaves it installed (the dir moved out of
    // incoming, so the candidate loop below will never revisit it) but
    // without its _FINALIZED record — finalize is marker-gated, so the
    // sweep is a no-op for every healthy bundle
    fs.listStatus(new Path(installDir)).filter(_.isDirectory).foreach { d =>
      if (fs.exists(new Path(d.getPath, "_INSTALLED")) &&
          !fs.exists(new Path(d.getPath, "_FINALIZED")))
        try finalizeBundle(fs, installDir, d.getPath.getName)
        catch { case _: Exception => () } // containment, like the loop below
    }
    val candidates = fs.listStatus(new Path(incomingDir))
      .filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
    candidates.toSeq.map { dir =>
      val name = dir.getName
      // per-bundle containment: one failing bundle (validation crash, rename
      // collision with a half-installed dir, fs hiccup) must not abort the
      // pass — and with it the watch daemon — for every OTHER arriving
      // bundle. Errors become Skipped outcomes (transient: no _INVALID
      // marker, so a later pass retries once the cause clears).
      try installBundle(spark, fs, dir, name, installDir, compact)
      catch {
        case e: Exception =>
          Skipped(name, s"install error: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }

  private def installBundle(spark: SparkSession, fs: FileSystem, dir: Path,
                            name: String, installDir: String,
                            compact: Boolean): Outcome = {
    {
      if (fs.exists(new Path(dir, "_INVALID")))
        Skipped(name, "previously marked invalid")
      else if (fs.exists(new Path(installDir, s"$name/_INSTALLED")))
        Skipped(name, "already installed")
      else if (fs.exists(new Path(dir, "_STARTED")))
        Skipped(name, "producer still writing (_STARTED present)")
      else {
        val single = fs.exists(new Path(dir, "manifest.json"))
        val multi = !single && fs.listStatus(dir)
          .exists(_.getPath.getName.matches("manifest_.*\\.json"))
        if (!single && !multi) Skipped(name, "no manifest yet")
        else if (single && !manifestCompleted(fs, dir))
          // a streaming producer's manifest says state:"streaming" until the
          // bundle is sealed (BundleStreamWriter.seal) — in-flight, not broken
          Skipped(name, "producer still writing (manifest state not completed)")
        else {
          // multi-index bundles validate every index against ITS manifest
          val (ok, docs, problems) =
            if (single) {
              val r = BundleValidate.validate(spark, dir.toString)
              (r.ok, r.shards.map(_.docs).sum, r.problems)
            } else {
              val rs = BundleValidate.validateMulti(spark, dir.toString)
              (rs.values.forall(_.ok),
                rs.values.flatMap(_.shards.map(_.docs)).sum,
                rs.toSeq.sortBy(_._1).flatMap { case (idx, r) =>
                  r.problems.map(p => s"[$idx] $p") })
            }
          if (!ok) {
            val out = fs.create(new Path(dir, "_INVALID"), true)
            out.write(problems.mkString("\n").getBytes("UTF-8")); out.close()
            Invalid(name, problems)
          } else {
            // compaction is format- and layout-aware (BundleCompact reads
            // the bundle's own manifest), so multi-index bundles compact too
            if (compact) BundleCompact.compact(spark, dir.toString)
            val target = new Path(installDir, name)
            // marker BEFORE the rename: it rides the move, so there is no
            // crash window between "renamed into installDir" and "marked" —
            // a stray marker in a source dir whose rename then failed is
            // harmless (the skip check reads installDir, not incoming)
            fs.create(new Path(dir, "_INSTALLED"), true).close()
            if (!fs.rename(dir, target)) {
              fs.delete(new Path(dir, "_INSTALLED"), false)
              throw new IllegalStateException(s"could not install $dir -> $target")
            }
            finalizeBundle(fs, installDir, name)
            Installed(name, docs, compact)
          }
        }
      }
    }
  }

  /**
   * Post-install finalization — the reference leader's final-settings +
   * alias-swap step once a build completes (`NodeService.java:129-152`:
   * apply `finalIndexSetting`, wait for green, raise replica count;
   * `ESClient.java:155-171` `updateAlies`: remove the alias from the old
   * index, add it to the new one). This engine serves bundles from files,
   * not a live cluster, so "apply" means: record each manifest's
   * `finalSettings` as the bundle's EFFECTIVE serving settings in an
   * atomic `_FINALIZED` record (downstream loaders read the record, not
   * the build-time settings — the refresh-off/replicas-0 load profile
   * gives way to the recorded serving profile exactly once), and repoint
   * the install root's alias file: `_aliases/<alias>` holds
   * `{"bundle": ..., "indexName": ...}` for whatever was finalized under
   * that alias most recently — one tmp+rename overwrite, the same
   * swap-visibility the reference's remove+add alias pair provides.
   * Idempotent: `_FINALIZED` present means applied; a re-pass (or the
   * heal path for a crash between rename and finalize) changes nothing.
   */
  private def finalizeBundle(fs: FileSystem, installDir: String,
                             name: String): Unit = {
    val bundle = new Path(installDir, name)
    val marker = new Path(bundle, "_FINALIZED")
    if (fs.exists(marker)) return
    val manifests = fs.listStatus(bundle).map(_.getPath)
      .filter(p => p.getName == "manifest.json" ||
        p.getName.matches("manifest_.*\\.json"))
      .sortBy(_.getName)
    if (manifests.isEmpty) return
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // overwrite-ATOMIC publish: a plain delete+rename leaves a window in
    // which concurrent resolveAlias/readAlias see no alias file at all —
    // the reference's alias update has no such gap. Replace semantics
    // (and the local-scheme .crc sidecar handling) live in
    // [[FsAtomic.renameReplace]], shared with the multi-bundle manifest
    // publish.
    def writeAtomic(target: Path, body: String): Unit = {
      val tmp = new Path(target.getParent, s".${target.getName}.tmp")
      val out = fs.create(tmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      FsAtomic.renameReplace(fs, tmp, target)
    }
    val entries = manifests.map { mp =>
      val in = fs.open(mp)
      val root = try mapper.readTree(in.readAllBytes()) finally in.close()
      val idx = Option(root.get("indexName")).map(_.asText).getOrElse(name)
      val alias = Option(root.get("alias")).filterNot(_.isNull).map(_.asText)
      val settings = Option(root.get("finalSettings")).map { s =>
        val it = s.fields()
        val b = Seq.newBuilder[(String, String)]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
        b.result()
      }.getOrElse(Seq.empty)
      (idx, alias, settings)
    }
    // alias swap first, record last: a crash in between re-runs both (the
    // alias overwrite is idempotent), while the reverse order could leave
    // an "applied" record whose alias still points at the old bundle
    // records serialized with Jackson (reading already is): a name or
    // settings value containing a quote/backslash must round-trip, not
    // produce JSON the readers then fail to parse
    fs.mkdirs(new Path(installDir, "_aliases"))
    entries.foreach { case (idx, alias, _) =>
      alias.foreach { a =>
        // alias names are path segments under _aliases/: a '/', '..' or
        // leading dot would escape or nest — fail the finalize loudly
        // (Jackson-escaped manifests happily carry such strings, so the
        // guard must live here, at the interpolation)
        require(safeAliasName(a),
          s"unsafe alias name (allowed: [A-Za-z0-9._-]+, no leading " +
            s"dot): '$a' in bundle $name")
        val rec = mapper.createObjectNode()
        rec.put("bundle", name); rec.put("indexName", idx)
        writeAtomic(new Path(installDir, s"_aliases/$a"),
          mapper.writeValueAsString(rec))
      }
    }
    val applied = mapper.createArrayNode()
    entries.foreach { case (idx, alias, settings) =>
      val e = mapper.createObjectNode()
      e.put("indexName", idx)
      alias match {
        case Some(a) => e.put("alias", a)
        case None    => e.putNull("alias")
      }
      val st = mapper.createObjectNode()
      settings.sorted.foreach { case (k, v) => st.put(k, v) }
      e.set[com.fasterxml.jackson.databind.node.ObjectNode]("appliedSettings", st)
      applied.add(e)
      ()
    }
    val rec = mapper.createObjectNode()
    rec.set[com.fasterxml.jackson.databind.node.ObjectNode]("applied", applied)
    writeAtomic(marker, mapper.writeValueAsString(rec))
  }

  /** Path-segment-safe alias/bundle name: the charset the `_index` guard
    * enforces on the write side ([A-Za-z0-9._-]+, no leading dot). */
  private def safeAliasName(a: String): Boolean =
    a.nonEmpty && a.head != '.' && a.forall(c =>
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-')

  /** Resolve an alias at the install root: the `{bundle, indexName}` the
    * alias currently points to (the lookup indirection the reference's
    * alias swap provides), or None while nothing finalized under it. */
  def resolveAlias(spark: SparkSession, installDir: String,
                   alias: String): Option[(String, String)] = {
    require(safeAliasName(alias),
      s"unsafe alias name (allowed: [A-Za-z0-9._-]+, no leading dot): '$alias'")
    val fs = FileSystem.get(new java.net.URI(installDir),
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(installDir, s"_aliases/$alias")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root = try new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(in.readAllBytes()) finally in.close()
      Some((root.get("bundle").asText, root.get("indexName").asText))
    }
  }

  /** Read through an alias: resolve it at the install root and open the
    * bundle it points to with the connector — the reference search
    * client's "query the alias, not the index" usage. Delegates to the
    * connector's own alias option, so multi-index bundles get their
    * `_index=` partition scoped in the FILE LISTING (other indices'
    * files are never listed) with `_shard` routing pruning intact. */
  def readAlias(spark: SparkSession, installDir: String,
                alias: String): org.apache.spark.sql.DataFrame =
    spark.read.format("graft-bundle").option("alias", alias).load(installDir)

  private def manifestCompleted(fs: FileSystem, dir: Path): Boolean = {
    val in = fs.open(new Path(dir, "manifest.json"))
    val m = new String(in.readAllBytes(), "UTF-8")
    in.close()
    """"state":"completed"""".r.findFirstIn(m).isDefined
  }

  /** Polling daemon: repeat [[installOnce]] until `incomingDir/_COMPLETE`
    * exists and the last pass installed/invalidated nothing new, or until
    * `timeoutMs` elapses. Returns every outcome in arrival order. */
  def watch(spark: SparkSession, incomingDir: String, installDir: String,
            compact: Boolean = false, pollMs: Long = 10000L,
            timeoutMs: Long = 600000L): Seq[Outcome] = {
    val fs = FileSystem.get(new java.net.URI(incomingDir),
      spark.sparkContext.hadoopConfiguration)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    val all = scala.collection.mutable.ArrayBuffer.empty[Outcome]
    var done = false
    while (!done) {
      val pass = installOnce(spark, incomingDir, installDir, compact)
      all ++= pass.filterNot(_.isInstanceOf[Skipped])
      val progressed = pass.exists(o =>
        o.isInstanceOf[Installed] || o.isInstanceOf[Invalid])
      val complete = fs.exists(new Path(incomingDir, "_COMPLETE"))
      if (complete && !progressed) done = true
      else if (System.nanoTime() > deadline) done = true
      else if (!progressed) Thread.sleep(pollMs)
    }
    all.toSeq
  }
}
