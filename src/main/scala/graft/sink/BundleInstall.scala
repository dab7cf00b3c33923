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
            Installed(name, docs, compact)
          }
        }
      }
    }
  }

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
