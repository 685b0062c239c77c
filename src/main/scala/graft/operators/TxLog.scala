package graft.operators

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal single-file transaction log for lake zones — the missing
  * atomic-commit layer that [[Compaction]]'s scaladoc punts to external
  * fencing (reference writes raw prefixes with no table format:
  * `ddb_full_load.py:74` purge+overwrite, Firehose prefix appends at
  * `lib/dynamodb-streaming-datalake-stack.ts:199-203`).
  *
  * Protocol (a one-file Delta/Iceberg-shaped core, no dependencies):
  *  - The LIVE state of a zone is the newest complete commit under
  *    `zone/_txlog/gen-<N>`: either a FULL manifest (the zone-relative
  *    data-file list of generation N with per-file stats) or, for
  *    ordinary appends/merges/deletes, a DELTA commit recording only
  *    the files generation N added and removed relative to its base —
  *    Delta-Lake-style actions, so commit metadata is O(touched files),
  *    never O(table). Data files are immutable once referenced; every
  *    writer writes NEW files into a fresh `d-<uuid>/` subdir and then
  *    publishes a commit. Nothing ever renames or rewrites the files a
  *    concurrent reader may be holding.
  *  - Every [[CheckpointInterval]]-th generation also writes `chk-<N>`,
  *    the full resolved state at N, and advances the `_last_checkpoint`
  *    pointer (temp+atomic-rename; advisory — stale falls back to one
  *    listing). Readers resolve the head by probing forward from the
  *    pointer and folding ≤ interval tail deltas onto the nearest
  *    anchor, so head resolution is O(pointer + tail), not O(history).
  *  - [[vacuum]] folds history into the retention boundary: it anchors
  *    the oldest kept generation with a checkpoint, then drops every
  *    older delta commit, manifest, and checkpoint — a year of 60 s
  *    streaming commits stays a bounded log dir.
  *  - Publish claims the generation number with create-exclusive
  *    (`FileSystem.create(path, overwrite = false)`): two racing writers
  *    cannot both own gen N — the loser aborts (compact) or recomputes
  *    against the new head and retries (append).
  *  - A manifest is COMPLETE only if its trailing `end` marker parses; a
  *    reader that lists a manifest mid-write fails the parse and falls
  *    back to the previous generation. Readers therefore always see some
  *    full historical file set, never a partial one.
  *  - [[vacuum]] is the only deletion path, and it keeps the newest
  *    `keepGens` generations, so snapshots handed out up to `keepGens-1`
  *    publishes ago remain readable (time travel within the retention
  *    window, like Delta's VACUUM).
  *
  * Scale shape: a CHECKPOINT is O(live files) — at 100 TB with 128 MB
  * targets that is ~800k lines (~60 MB), read once per query plan on the
  * driver, never shuffled, and paid once per [[CheckpointInterval]]
  * commits rather than per commit (production formats shard checkpoints
  * past that point — Delta's multi-part checkpoint; the same refinement
  * applies here). A streaming merge commit writes only its touched-file
  * actions. Create-exclusive is atomic on HDFS and POSIX; an
  * eventually-consistent object store needs a conditional-put primitive
  * here (the same LogStore caveat Delta documents).
  */
object TxLog {

  /** Typed per-file column statistics: `kind` is "num" (min/max compare
    * as doubles) or "str" (lexicographic — dates/timestamps stringify ISO,
    * so lexicographic == chronological). `min`/`max` are None when the
    * column is entirely null in the file. */
  final case class ColStat(kind: String, rows: Long, nulls: Long,
                           min: Option[String], max: Option[String])

  final case class Snapshot(gen: Long, format: String, files: Seq[String],
                            meta: Map[String, String] = Map.empty,
                            stats: Map[String, (Double, Double)] = Map.empty,
                            colStats: Map[String, Map[String, ColStat]] = Map.empty,
                            /** generation this one was rebased on (gen-1
                              * unless skip-forward claimed past a torn
                              * corpse); drives the post-publish fork
                              * check. Manifests written before the field
                              * existed read back as gen-1. */
                            base: Long = -1L,
                            /** per-file (bytes, mtimeMillis), stamped at
                              * commit time from the listing the committer
                              * already does — so scan planning needs ZERO
                              * per-file FS RPCs (at 800k kept files that
                              * is the difference between a manifest read
                              * and 800k sequential driver HEADs).
                              * Manifests written before the field existed
                              * read back empty; readers fall back to a
                              * per-directory listing for uncovered files. */
                            sizes: Map[String, (Long, Long)] = Map.empty) {
    def resolve(zone: String): Seq[String] =
      files.map(f => zone.stripSuffix("/") + "/" + f)
    def baseGen: Long = if (base >= 0L) base else gen - 1L
  }

  /** `rewritten` false = no-op (already compact) or lost-race abort. */
  final case class CompactStats(gen: Long, filesBefore: Long, filesAfter: Long,
                                bytesBefore: Long, rewritten: Boolean)

  private val LogDir = "_txlog"
  private val Header = "graft-txlog v1"

  /** Highest manifest protocol this reader/writer understands. Writers
    * stamp it into every commit (`protocol=N`); readers REFUSE any
    * manifest claiming a higher one — a future format must fail loudly,
    * never be half-parsed as the fields this version happens to know
    * (Delta's minReaderVersion contract). Manifests written before the
    * stamp existed read as protocol 1. */
  private[graft] val ProtocolVersion = 1L

  /** Loud forward-compat refusal — deliberately NOT an IOException /
    * parse failure, so the torn-manifest recovery paths (which treat
    * unreadable bytes as a crash corpse to skip) can never swallow it. */
  final class UnsupportedProtocolException(msg: String)
      extends RuntimeException(msg)

  /** Every `CheckpointInterval`-th generation also writes a `chk-<N>`
    * checkpoint manifest (the FULL resolved state at N) and bumps the
    * `_last_checkpoint` pointer — the Delta-style bound that keeps head
    * resolution at one pointer read + ≤ interval tail commits instead of
    * an O(history) chain walk. */
  private[graft] val CheckpointInterval = 10L

  private def fs(spark: SparkSession, zone: String): FileSystem =
    new Path(zone).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDirPath(zone: String) =
    new Path(zone.stripSuffix("/"), LogDir)

  private def genPath(zone: String, gen: Long) =
    new Path(zone.stripSuffix("/") + "/" + LogDir, f"gen-$gen%020d")

  private def chkPath(zone: String, gen: Long) =
    new Path(zone.stripSuffix("/") + "/" + LogDir, f"chk-$gen%020d")

  /** One shard of a MULTI-PART checkpoint (Delta's multi-part idea): at
    * 100 TB a checkpoint is ~800k per-file lines (~60 MB) — one writer
    * streaming one file serializes the driver on a single PUT and makes
    * the read a single-threaded scan. Past
    * [[checkpointShardLines]] per-file lines the per-file payload splits
    * into `chp-<gen>-<i>-of-<n>` parts (each its own end-terminated,
    * header-stamped file) and the base `chk-<gen>` carries only the kv
    * header + `parts=n` + the total count, written LAST as the commit
    * marker — a crash mid-shard leaves invisible parts, never a
    * half-readable checkpoint, and any torn/missing part makes the whole
    * checkpoint read as absent (the chain-walk fallback, same corpse
    * tolerance as everywhere). */
  private def chpPath(zone: String, gen: Long, i: Int, n: Int) =
    new Path(zone.stripSuffix("/") + "/" + LogDir,
      f"chp-$gen%020d-$i%05d-of-$n%05d")

  /** Shard threshold in per-file LINES (files + stats + sizes). The
    * system property is the ops/test tuning knob; the default keeps
    * every part comfortably re-readable in one buffer. */
  private[graft] def checkpointShardLines: Int =
    sys.props.get("graft.txlog.chk.shardLines").map(_.toInt).getOrElse(100000)

  private def pointerPath(zone: String) =
    new Path(zone.stripSuffix("/") + "/" + LogDir, "_last_checkpoint")

  /** Best-effort checkpoint pointer: the generation of a checkpoint (or
    * vacuum anchor) known to exist. Advisory only — a stale or missing
    * pointer falls back to a directory listing, never to a wrong head. */
  private def readPointer(f: FileSystem, zone: String): Option[Long] =
    try {
      val in = f.open(pointerPath(zone))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .nextOption().flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Pointer update via temp-file + atomic move (the pointer is the one
    * mutable file in the log; a torn overwrite must never be readable).
    * Best-effort: any failure leaves the old pointer, which is merely
    * slower, not wrong. Never moves the pointer backwards. */
  private def writePointer(f: FileSystem, zone: String, gen: Long): Unit =
    try {
      if (readPointer(f, zone).exists(_ >= gen)) return
      val dst = pointerPath(zone)
      val tmp = new Path(dst.getParent, s"._last_checkpoint.tmp-${UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, true)
      try out.write((gen.toString + "\n").getBytes("UTF-8")) finally out.close()
      val qualified = f.makeQualified(dst)
      if (qualified.toUri.getScheme == "file") {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath),
          java.nio.file.Paths.get(qualified.toUri.getPath),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } else {
        f.delete(dst, false)
        f.rename(tmp, dst)
      }
    } catch { case _: Exception => () }

  /** The head GENERATION NUMBER without listing the whole log dir: start
    * at the checkpoint pointer and probe forward — claimed generation
    * numbers are contiguous above any complete commit (skip-forward only
    * skips numbers whose torn file EXISTS, and vacuum deletes only below
    * its anchor), so the first missing `gen-(g+1)` marks the frontier.
    * Falls back to one full listing when the pointer is missing/stale —
    * after GC the dir is bounded anyway, so the fallback stays cheap. */
  private def findHeadGen(f: FileSystem, zone: String): Long = {
    readPointer(f, zone) match {
      case Some(p) if f.exists(genPath(zone, p)) || f.exists(chkPath(zone, p)) =>
        var g = p
        while (f.exists(genPath(zone, g + 1))) g += 1
        g
      case _ =>
        val dir = logDirPath(zone)
        if (!f.exists(dir)) -1L
        else f.listStatus(dir).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("gen-"))
          .flatMap(n => scala.util.Try(n.stripPrefix("gen-").toLong).toOption)
          .sorted.lastOption.getOrElse(-1L)
    }
  }

  /** Newest complete, fully-resolvable snapshot: find the head number,
    * resolve its delta chain back to the nearest anchor (a full manifest
    * or a `chk-` checkpoint), and fold forward. Torn or unresolvable
    * heads step down one number at a time — readers always land on some
    * complete historical state, never a partial one. */
  def latest(spark: SparkSession, zone: String): Option[Snapshot] = {
    val f = fs(spark, zone)
    if (!f.exists(logDirPath(zone))) return None
    var g = findHeadGen(f, zone)
    while (g >= 0L) {
      resolveSnapshot(f, zone, g) match {
        case Some(s) => return Some(s)
        case None => g -= 1L
      }
    }
    None
  }

  // typed-stat value encoding: URL-encode with a "v" prefix so the None
  // sentinel "-" can never collide with a real value
  private def encV(v: Option[String]): String =
    v.map(s => "v" + java.net.URLEncoder.encode(s, "UTF-8")).getOrElse("-")
  private def decV(s: String): Option[String] =
    if (s == "-") None else Some(java.net.URLDecoder.decode(s.substring(1), "UTF-8"))

  /** One parsed, COMPLETE log entry: either a full snapshot manifest
    * (gen-0 inits, checkpoints, rewrite-everything commits) or a
    * delta commit recording only the files this generation added and
    * removed relative to its base — the O(touched-files) encoding that
    * keeps a streaming merge sink's commit metadata proportional to the
    * batch, never the table. */
  private[graft] sealed trait Commit { def gen: Long; def baseGen: Long }
  private[graft] final case class FullCommit(s: Snapshot) extends Commit {
    def gen: Long = s.gen; def baseGen: Long = s.baseGen
  }
  private[graft] final case class DeltaCommit(
      gen: Long, base: Long, format: String,
      adds: Vector[String], removes: Vector[String],
      meta: Map[String, String],
      stats: Map[String, (Double, Double)],
      colStats: Map[String, Map[String, ColStat]],
      sizes: Map[String, (Long, Long)] = Map.empty) extends Commit {
    def baseGen: Long = base
  }

  /** The generation number a manifest path CLAIMS via its filename; a
    * complete body whose recorded gen disagrees (e.g. a stray copy of
    * another generation's bytes) is treated as invalid, not trusted. */
  private def pathGen(p: Path): Option[Long] = {
    val n = p.getName
    val num = if (n.startsWith("gen-")) n.stripPrefix("gen-")
              else if (n.startsWith("chk-")) n.stripPrefix("chk-")
              else return None
    scala.util.Try(num.toLong).toOption
  }

  private def readCommit(f: FileSystem, p: Path): Option[Commit] = {
    val in = try f.open(p) catch { case _: java.io.IOException => return None }
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      // completeness FIRST: only an `end`-terminated manifest can claim
      // anything — a file truncated mid-header must read as torn, not as
      // a future format (the fuzz spec truncates at every byte)
      if (lines.isEmpty || lines.last != "end") return None
      // a COMPLETE manifest with a higher header version is a future
      // format — refuse loudly before any field is trusted
      if (lines.head != Header) {
        if (lines.head.startsWith("graft-txlog v"))
          throw new UnsupportedProtocolException(
            s"$p was written by a newer txlog format ('${lines.head}'; this " +
              s"reader understands '$Header') — upgrade the reader; refusing " +
              "to half-parse a future manifest")
        return None
      }
      val body = lines.tail.init
      // protocol check BEFORE the generic body parse: a future manifest
      // may carry line types this parser chokes on (that throw would be
      // swallowed as a torn corpse below, silently serving an OLDER
      // generation), so the refusal must not depend on the rest of the
      // body being parseable
      val proto = body.collectFirst { case l if l.startsWith("protocol=") =>
        val raw = l.substring("protocol=".length)
        // an UNPARSEABLE protocol value on an end-terminated manifest is a
        // future format too ("protocol=2.0", "protocol=x"): a plain
        // NumberFormatException here would be swallowed by the torn-corpse
        // tolerance below and silently serve an OLDER generation — the
        // exact failure the loud refusal exists to prevent
        scala.util.Try(raw.trim.toLong).getOrElse(
          throw new UnsupportedProtocolException(
            s"$p carries an unparseable txlog protocol value '$raw' (this " +
              s"reader understands up to $ProtocolVersion) — upgrade the " +
              "reader; refusing to half-parse a future manifest"))
      }.getOrElse(1L)
      if (proto > ProtocolVersion)
        throw new UnsupportedProtocolException(
          s"$p claims txlog protocol $proto; this reader understands up to " +
            s"$ProtocolVersion — upgrade the reader; refusing to half-parse " +
            "a future manifest")
      val kv = body.filterNot(l =>
        l.startsWith("f ") || l.startsWith("m ") || l.startsWith("s ") ||
          l.startsWith("t ") || l.startsWith("r ") || l.startsWith("b ")).map { l =>
        val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
      }.toMap
      val gen = kv("gen").toLong
      if (!pathGen(p).contains(gen)) return None
      val meta = body.filter(_.startsWith("m ")).map { l =>
        val i = l.indexOf('=', 2); (l.substring(2, i), l.substring(i + 1))
      }.toMap
      // per-file line families — shared by the inline body and any
      // multi-part checkpoint shards spliced in below:
      // "s <relpath>=<min>,<max>"                         legacy doubles
      // "t <relpath>|<col>=<kind>,<rows>,<nulls>,<mn>,<mx>"  typed stats
      // "b <relpath>=<bytes>,<mtimeMillis>"         sizes (optional, new)
      // "f <relpath>"                                             files
      def parsePerFile(b: Vector[String]) = {
        val st = b.filter(_.startsWith("s ")).map { l =>
          val i = l.lastIndexOf('=')
          val Array(mn, mx) = l.substring(i + 1).split(",", 2)
          (l.substring(2, i), (mn.toDouble, mx.toDouble))
        }.toMap
        val cst = b.filter(_.startsWith("t ")).map { l =>
          val eq = l.indexOf('=', 2)
          val key = l.substring(2, eq)
          val bar = key.lastIndexOf('|')
          val Array(kind, rows, nulls, mn, mx) = l.substring(eq + 1).split(",", 5)
          (key.substring(0, bar), key.substring(bar + 1),
            ColStat(kind, rows.toLong, nulls.toLong, decV(mn), decV(mx)))
        }.groupBy(_._1).map { case (file, ts) =>
          file -> ts.map(t => t._2 -> t._3).toMap
        }
        val sz = b.filter(_.startsWith("b ")).map { l =>
          val i = l.lastIndexOf('=')
          val Array(len, mt) = l.substring(i + 1).split(",", 2)
          (l.substring(2, i), (len.toLong, mt.toLong))
        }.toMap
        (st, cst, sz, b.filter(_.startsWith("f ")).map(_.substring(2)))
      }
      // multi-part checkpoint: splice every shard's per-file lines in
      // BEFORE the completeness count check — a torn/missing shard makes
      // the whole checkpoint read as absent
      val partBody: Vector[String] = kv.get("parts") match {
        case Some(nStr) =>
          val n = nStr.toInt
          val zoneOfP = p.getParent.getParent.toString
          (1 to n).toVector.flatMap { i =>
            val pp = chpPath(zoneOfP, gen, i, n)
            val pin = try f.open(pp) catch {
              case _: java.io.IOException => return None }
            val plines =
              try scala.io.Source.fromInputStream(pin, "UTF-8").getLines().toVector
              finally pin.close()
            if (plines.isEmpty || plines.last != "end" ||
                plines.head != Header) return None
            val pbody = plines.tail.init
            val pkv = pbody.filterNot(l => l.startsWith("f ") ||
                l.startsWith("s ") || l.startsWith("t ") || l.startsWith("b "))
              .map { l => val j = l.indexOf('='); (l.substring(0, j), l.substring(j + 1)) }
              .toMap
            // each shard carries its own protocol line and gets the same
            // loud refusal as the base chk file — a future-protocol shard
            // must not be half-parsed and spliced silently
            pkv.get("protocol").foreach { raw =>
              val pv = scala.util.Try(raw.trim.toLong).getOrElse(
                throw new UnsupportedProtocolException(
                  s"$pp carries an unparseable txlog protocol value '$raw' " +
                    s"(this reader understands up to $ProtocolVersion) — " +
                    "upgrade the reader; refusing to half-parse a future shard"))
              if (pv > ProtocolVersion)
                throw new UnsupportedProtocolException(
                  s"$pp claims txlog protocol $pv; this reader understands " +
                    s"up to $ProtocolVersion — upgrade the reader; refusing " +
                    "to half-parse a future shard")
            }
            if (!pkv.get("gen").contains(gen.toString) ||
                !pkv.get("part").contains(i.toString) ||
                !pkv.get("parts").contains(n.toString)) return None
            pbody.filter(l => l.startsWith("f ") || l.startsWith("s ") ||
              l.startsWith("t ") || l.startsWith("b "))
          }
        case None => Vector.empty
      }
      val (stats, colStats, sizes, files) = parsePerFile(body ++ partBody)
      val base = kv.get("base").map(_.toLong).getOrElse(-1L)
      if (kv.get("kind").contains("delta")) {
        val removes = body.filter(_.startsWith("r ")).map(_.substring(2))
        // completeness: BOTH counts must match (a truncated delta could
        // otherwise drop its tail removes and resurrect deleted files)
        if (kv.get("addcount").map(_.toLong).contains(files.size.toLong) &&
            kv.get("rmcount").map(_.toLong).contains(removes.size.toLong) &&
            base >= 0L)
          Some(DeltaCommit(gen, base, kv("format"), files.toVector,
            removes.toVector, meta, stats, colStats, sizes))
        else None
      } else {
        if (kv.get("count").map(_.toLong).contains(files.size.toLong))
          Some(FullCommit(Snapshot(gen, kv("format"), files, meta, stats,
            colStats, base = base, sizes = sizes)))
        else None
      }
    } catch {
      // the protocol refusal must escape the torn-corpse tolerance below
      case e: UnsupportedProtocolException => throw e
      case _: Exception => None
    }
    finally in.close()
  }

  /** Fold one delta onto its resolved base state. Per-file stats are
    * immutable once committed (data files never change), so a delta's
    * stat entries cover exactly its added files. */
  private def applyDelta(s: Snapshot, d: DeltaCommit): Snapshot = {
    val rm = d.removes.toSet
    Snapshot(d.gen, d.format,
      (s.files.filterNot(rm) ++ d.adds).distinct.sorted, d.meta,
      (s.stats -- rm) ++ d.stats, (s.colStats -- rm) ++ d.colStats,
      base = d.base, sizes = (s.sizes -- rm) ++ d.sizes)
  }

  /** The complete state at generation `gen`: walk base pointers back
    * through delta commits until an ANCHOR — a full manifest, or a
    * `chk-` checkpoint standing in for one — then fold the deltas
    * forward. Bounded by the checkpoint interval in steady state; None
    * when `gen` is torn, missing, or its chain is broken (the caller
    * steps down or reports the generation as gone). */
  private def resolveSnapshot(f: FileSystem, zone: String, gen: Long): Option[Snapshot] = {
    var deltas = List.empty[DeltaCommit]
    var g = gen
    var anchor: Option[Snapshot] = None
    // hard bound: a chain longer than this means checkpoints were never
    // written (legacy zone) — still resolved, just linearly
    var steps = 0
    while (anchor.isEmpty && steps < 1000000) {
      steps += 1
      readCommit(f, genPath(zone, g)) match {
        case Some(FullCommit(s)) => anchor = Some(s)
        case Some(d: DeltaCommit) =>
          readCommit(f, chkPath(zone, g)) match {
            // a checkpoint AT g short-circuits the walk; keep the delta's
            // true base so fork accounting survives reconstruction
            case Some(FullCommit(c)) => anchor = Some(c.copy(base = d.base))
            case _ => deltas ::= d; g = d.base
          }
        case None =>
          // gen file gone (GC'd below a vacuum anchor) but its checkpoint
          // kept: the checkpoint IS the state
          readCommit(f, chkPath(zone, g)) match {
            case Some(FullCommit(c)) => anchor = Some(c)
            case _ => return None
          }
      }
    }
    anchor.map(a => deltas.foldLeft(a)(applyDelta))
  }

  /** Write the FULL resolved state at `gen` as a `chk-<gen>` checkpoint
    * manifest (create-exclusive — racing checkpointers write identical
    * content, so the loser just skips) and advance the pointer.
    * Best-effort: a failed checkpoint costs chain-walk length, never
    * correctness. */
  private def writeCheckpoint(f: FileSystem, zone: String, s: Snapshot): Unit =
    try {
      val pf = perFileLines(s.files, s.stats, s.colStats, s.sizes)
      val shard = checkpointShardLines
      if (pf.size <= shard) {
        tryCreate(f, chkPath(zone, s.gen)).foreach { out =>
          try out.write(manifestBody(delta = false, gen = s.gen,
            base = s.baseGen, format = s.format, files = s.files,
            removes = Nil, meta = s.meta, stats = s.stats,
            colStats = s.colStats, sizes = s.sizes).getBytes("UTF-8"))
          finally out.close()
        }
      } else {
        // MULTI-PART: per-file lines split deterministically into n
        // shards (racing checkpointers write byte-identical parts, so
        // create-exclusive losers just skip); the base chk-<gen> lands
        // LAST as the commit marker — until it exists no reader sees
        // the parts, and after it exists a torn part reads as no
        // checkpoint at all (never a partial state).
        val n = ((pf.size + shard - 1) / shard)
        pf.grouped(shard).zipWithIndex.foreach { case (chunk, idx) =>
          tryCreate(f, chpPath(zone, s.gen, idx + 1, n)).foreach { out =>
            val b = new StringBuilder(Header).append('\n')
              .append("protocol=").append(ProtocolVersion).append('\n')
              .append("gen=").append(s.gen).append('\n')
              .append("part=").append(idx + 1).append('\n')
              .append("parts=").append(n).append('\n')
            chunk.foreach(l => b.append(l).append('\n'))
            b.append("end\n")
            try out.write(b.toString.getBytes("UTF-8")) finally out.close()
          }
        }
        tryCreate(f, chkPath(zone, s.gen)).foreach { out =>
          val b = new StringBuilder(Header).append('\n')
            .append("protocol=").append(ProtocolVersion).append('\n')
            .append("gen=").append(s.gen).append('\n')
            .append("base=").append(s.baseGen).append('\n')
            .append("format=").append(s.format).append('\n')
            .append("parts=").append(n).append('\n')
            .append("count=").append(s.files.size).append('\n')
          s.meta.toSeq.sortBy(_._1).foreach { case (k, v) =>
            b.append("m ").append(k).append('=').append(v).append('\n') }
          b.append("end\n")
          try out.write(b.toString.getBytes("UTF-8")) finally out.close()
        }
      }
      writePointer(f, zone, s.gen)
    } catch { case _: Exception => () }

  /** A writer that crashes between claiming a generation (create-exclusive)
    * and completing the manifest body leaves a TORN manifest occupying the
    * number: `latest` skips it, so every later publish recomputes the same
    * head and collides with the corpse forever — one crash would wedge the
    * zone. Collisions therefore SKIP PAST torn manifests older than this
    * grace window and claim the next free generation number. Skipping —
    * rather than delete-and-recreate — keeps the publish path free of
    * deletions, so there is no window in which a second reclaimer's stale
    * view of the corpse can delete the first reclaimer's freshly created
    * in-flight manifest (the delete form loses an acknowledged commit in
    * exactly the multi-writer-retry scenario reclaim exists for).
    * `latest` and [[vacuum]] already tolerate generation gaps, and vacuum
    * GC's the corpse itself once it ages out. Complete manifests are
    * never skipped, and the window is sized so an IN-FLIGHT publish
    * (created milliseconds ago, body still streaming) is never bypassed
    * — its writer still owns its number. */
  private[operators] val TornManifestGraceMs: Long = 15L * 60L * 1000L

  /** The atomic generation claim: create-if-absent. HDFS enforces this at
    * the namenode, but the Hadoop local filesystem implements
    * create(overwrite=false) as exists()-then-create — two racing writers
    * can both pass the check and silently overwrite each other. On file:
    * URIs go straight to O_CREAT|O_EXCL via CREATE_NEW. */
  private def tryCreate(f: FileSystem, p: Path): Option[java.io.OutputStream] = {
    val qualified = f.makeQualified(p)
    if (qualified.toUri.getScheme == "file") {
      val local = java.nio.file.Paths.get(qualified.toUri.getPath)
      try Some(java.nio.file.Files.newOutputStream(local,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE))
      catch {
        case _: java.nio.file.FileAlreadyExistsException => None
        case _: java.io.IOException => None
      }
    } else {
      try Some(f.create(p, /*overwrite=*/ false))
      catch { case _: java.io.IOException => None }
    }
  }

  /** What a collided generation path currently holds. */
  private sealed trait Occupant
  private case object Vanished extends Occupant      // retry the same number
  private case object TornExpired extends Occupant   // corpse: skip the number
  private case object Owned extends Occupant         // complete or in-flight

  private def occupant(f: FileSystem, p: Path): Occupant =
    try {
      val st = f.getFileStatus(p)
      if (readCommit(f, p).nonEmpty) Owned
      else if (st.getModificationTime <
        System.currentTimeMillis() - TornManifestGraceMs) TornExpired
      else Owned
    } catch {
      case _: java.io.FileNotFoundException => Vanished
      case _: java.io.IOException => Owned
    }

  /** Serialize one manifest body. A FULL manifest (`delta = false`)
    * lists every live file with its stats; a DELTA commit lists only
    * `files` = the generation's ADDED files (with their stats) and
    * `removes` = the files it dropped, each count pinned so a truncated
    * tail can never parse as complete. */
  private def manifestBody(delta: Boolean, gen: Long, base: Long,
                           format: String, files: Seq[String],
                           removes: Seq[String], meta: Map[String, String],
                           stats: Map[String, (Double, Double)],
                           colStats: Map[String, Map[String, ColStat]],
                           sizes: Map[String, (Long, Long)] = Map.empty): String = {
    val body = new StringBuilder(Header).append('\n')
      .append("protocol=").append(ProtocolVersion).append('\n')
      .append("gen=").append(gen).append('\n')
      .append("base=").append(base).append('\n')
    if (delta) body.append("kind=delta\n")
    body.append("format=").append(format).append('\n')
    if (delta)
      body.append("addcount=").append(files.size).append('\n')
        .append("rmcount=").append(removes.size).append('\n')
    else
      body.append("count=").append(files.size).append('\n')
    meta.toSeq.sortBy(_._1).foreach { case (k, v) =>
      body.append("m ").append(k).append('=').append(v).append('\n') }
    perFileLines(files, stats, colStats, sizes)
      .foreach(l => body.append(l).append('\n'))
    removes.sorted.foreach(fl => body.append("r ").append(fl).append('\n'))
    body.append("end\n")
    body.toString
  }

  /** The per-file line families (s/t/b/f), rendered in the canonical
    * order — the unit multi-part checkpoints shard on. */
  private def perFileLines(files: Seq[String],
                           stats: Map[String, (Double, Double)],
                           colStats: Map[String, Map[String, ColStat]],
                           sizes: Map[String, (Long, Long)]): Vector[String] = {
    val out = Vector.newBuilder[String]
    stats.toSeq.sortBy(_._1).foreach { case (k, (mn, mx)) =>
      out += s"s $k=$mn,$mx" }
    colStats.toSeq.sortBy(_._1).foreach { case (file, perCol) =>
      perCol.toSeq.sortBy(_._1).foreach { case (c, st) =>
        out += s"t $file|$c=${st.kind},${st.rows},${st.nulls}," +
          s"${encV(st.min)},${encV(st.max)}" } }
    sizes.toSeq.sortBy(_._1).foreach { case (file, (len, mt)) =>
      out += s"b $file=$len,$mt" }
    files.sorted.foreach(fl => out += s"f $fl")
    out.result()
  }

  /** Atomically publish a new generation at number `gen` (rebased on head
    * `gen - 1`) — or, when that number is occupied by a crash-torn
    * manifest past the grace window, at the next free number (the corpse
    * is skipped, never deleted; see [[TornManifestGraceMs]]). Returns the
    * claimed generation number, or None when another writer owns `gen`
    * with a complete or in-flight manifest — the caller rebases on the
    * new head and retries.
    *
    * FORK CHECK: number-skipping (and a vacuumed corpse freeing a number
    * below an in-flight higher claim) makes it possible for two writers
    * rebased on the SAME head to both complete, at different numbers —
    * the higher manifest would silently drop the lower writer's files.
    * Two defenses, both one directory listing:
    *
    *  1. CLAIM GUARD — right after create-exclusive succeeds, the writer
    *     lists the log; if a COMPLETE manifest with a HIGHER number
    *     already exists, the claimed number is a vacuum-freed hole below
    *     the head — the writer releases its claim and rebases. This
    *     kills the stale-writer-reclaims-a-freed-number arm before any
    *     body is written.
    *  2. FORK CHECK — every manifest records its `base` generation, and
    *     after completing the body the writer re-lists: a rival COMPLETE
    *     manifest with `gen > base` and `base <= our base` means the
    *     chains forked — this writer deletes its OWN manifest (never the
    *     rival's) and reports a lost race. Both arms close before either
    *     checks is impossible in one order (each check follows its own
    *     close), so at most one arm survives; both may yield (both saw
    *     each other) and both then retry — safe. A successor that
    *     rebased ON our generation has `base >= our gen > our base` and
    *     never triggers the check, so serialized commits see no false
    *     aborts.
    *
    * RESIDUAL WINDOW (documented, not closed — the local FS offers no
    * atomic publish primitive to close it): between this writer's body
    * close and its fork-check delete, a successor can read the soon-to-
    * be-deleted manifest as head and build on it, resurrecting the
    * yielded arm's FILES while the rival arm's writer has already
    * acknowledged. Reaching it requires a crash-torn manifest, a vacuum
    * that GC'd it, a stale writer reclaiming the freed number inside the
    * claim-guard race window, AND a successor landing inside this
    * sub-second close-to-check interval — four independent actors. The
    * rebase path dedupes file lists, so even then no row duplicates; the
    * exposure is the rival arm's acknowledged rows missing from the
    * successor chain, the same single-writer-per-zone caveat
    * [[exactlyOnceAppend]] already documents. */
  private def publish(spark: SparkSession, zone: String, gen: Long,
                      format: String, files: Seq[String],
                      meta: Map[String, String] = Map.empty,
                      stats: Map[String, (Double, Double)] = Map.empty,
                      colStats: Map[String, Map[String, ColStat]] = Map.empty,
                      base: Option[Snapshot] = None,
                      sizes: Map[String, (Long, Long)] = Map.empty): Option[Long] = {
    require(meta.forall { case (k, v) =>
      !k.contains('=') && !(k + v).exists(c => c == '\n' || c == '\r') },
      s"manifest meta keys must be =-free and values newline-free: $meta")
    require(colStats.values.flatMap(_.keys).forall(c =>
      !c.contains('|') && !c.contains('=') && !c.contains(',')),
      "stats column names must be free of | = , characters")
    val f = fs(spark, zone)
    f.mkdirs(genPath(zone, gen).getParent)
    var g = gen
    var claimed: Option[java.io.OutputStream] = None
    // bounded walk: each step either retries a vanished path or skips one
    // expired corpse; anything else is a genuine lost race
    var steps = 0
    while (claimed.isEmpty && steps < 64) {
      steps += 1
      val p = genPath(zone, g)
      claimed = tryCreate(f, p)
      if (claimed.isEmpty) occupant(f, p) match {
        case Vanished    => () // vacuumed between collide and check: same g
        case TornExpired => g += 1
        case Owned       => return None
      }
    }
    val out = claimed.getOrElse(return None)
    val baseGen = gen - 1L
    // claim guard (see scaladoc): a COMPLETE manifest numbered above our
    // claim means we grabbed a vacuum-freed hole below the head — release
    // the claim (ours, body-less, safe to delete) and rebase. The guard
    // runs while our claim stream is open, so ANY failure here must also
    // release it: leaking the empty claim would wedge the number behind
    // occupant=Owned until the torn-manifest grace window expires.
    val aboveUs = try {
      val dir0 = genPath(zone, g).getParent
      f.listStatus(dir0).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("gen-") &&
          scala.util.Try(p.getName.stripPrefix("gen-").toLong).toOption.exists(_ > g))
        .exists(p => readCommit(f, p).isDefined)
    } catch { case e: Throwable =>
      // best-effort each step: a close() that ALSO throws (same flaky FS)
      // must not skip the delete or mask the original error
      try out.close() catch { case _: Throwable => () }
      try f.delete(genPath(zone, g), false) catch { case _: Throwable => () }
      throw e
    }
    if (aboveUs) {
      try out.close() catch { case _: Throwable => () }
      f.delete(genPath(zone, g), false)
      return None
    }
    try {
      // DELTA ENCODING: commit metadata must be O(touched files), never
      // O(table) — at a streaming merge sink's cadence a full-snapshot
      // manifest per commit writes the whole live-file list every 60 s.
      // When the diff against the rebased head is no smaller than the
      // full list (replace/compact/restore-far), write a FULL manifest
      // instead: same bytes, and it doubles as a chain ANCHOR.
      val body = base match {
        case Some(b) =>
          val baseSet = b.files.toSet
          val nextSet = files.toSet
          val adds = files.filterNot(baseSet)
          val removes = b.files.filterNot(nextSet)
          if (adds.size + removes.size >= files.size)
            manifestBody(delta = false, g, baseGen, format, files, Nil,
              meta, stats, colStats, sizes)
          else
            manifestBody(delta = true, g, baseGen, format, adds, removes,
              meta,
              stats.filter { case (k, _) => !baseSet(k) || !b.stats.get(k).contains(stats(k)) },
              colStats.filter { case (k, _) => !baseSet(k) || !b.colStats.get(k).contains(colStats(k)) },
              sizes.filter { case (k, _) => !baseSet(k) || !b.sizes.get(k).contains(sizes(k)) })
        case None =>
          manifestBody(delta = false, g, baseGen, format, files, Nil,
            meta, stats, colStats, sizes)
      }
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    // fork check (see scaladoc): a rival complete manifest that was also
    // rebased on our base (or older) means two chains — yield ours. The
    // filename encodes the generation, so only manifests numbered above
    // our base are parsed: in a serialized history that set is exactly
    // {ours}, making the check one directory listing and zero reads.
    val dir = genPath(zone, g).getParent
    val rivals = f.listStatus(dir).toSeq.map(_.getPath)
      .filter { p =>
        p.getName.startsWith("gen-") && p.getName != genPath(zone, g).getName &&
          scala.util.Try(p.getName.stripPrefix("gen-").toLong).toOption
            .exists(_ > baseGen)
      }
      .flatMap(p => readCommit(f, p))
      .filter(c => isForkRivalGen(c.gen, c.baseGen, baseGen))
    if (rivals.nonEmpty) {
      f.delete(genPath(zone, g), false)
      None
    } else {
      // CHECKPOINT HOOK: every CheckpointInterval-th generation also
      // writes its full resolved state as chk-<g> and bumps the pointer,
      // bounding every later reader's chain walk. The publisher holds the
      // complete next state in memory, so this is one extra small write —
      // and best-effort: a crash here only lengthens chains.
      if (g > 0L && g % CheckpointInterval == 0L)
        writeCheckpoint(f, zone, Snapshot(g, format, files, meta, stats,
          colStats, base = baseGen, sizes = sizes))
      Some(g)
    }
  }

  /** The fork-check predicate, factored for direct testing (the claim
    * guard resolves most staged races before the post-close check can
    * fire, so this logic is hard to reach end-to-end): a COMPLETE rival
    * manifest is a fork arm iff it is numbered above our base AND was
    * itself rebased on our base or older. A successor that built ON our
    * generation has `baseGen >= our gen > our base` and is never a
    * rival; our own base and its ancestors are numbered <= our base. */
  private[graft] def isForkRival(m: Snapshot, ourBase: Long): Boolean =
    isForkRivalGen(m.gen, m.baseGen, ourBase)

  private def isForkRivalGen(gen: Long, base: Long, ourBase: Long): Boolean =
    gen > ourBase && base <= ourBase

  /** Zone-relative data files currently under `dir` (one `d-<uuid>`
    * write dir), skipping Spark's _SUCCESS/hidden files. */
  /** Recursive data-file listing under `dir`, zone-relative, WITH each
    * file's (bytes, mtimeMillis) — the committer already pays this
    * listing, so stamping sizes into the manifest is free here and saves
    * every later scan plan a per-file `getFileStatus` pass. */
  private def listRelInfo(f: FileSystem, zoneRoot: Path, dir: Path)
      : Seq[(String, (Long, Long))] = {
    val it = f.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, (Long, Long))]
    val rootUri = zoneRoot.toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith("."))
        buf += ((st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/"),
          (st.getLen, st.getModificationTime)))
    }
    buf.toSeq.sortBy(_._1)
  }

  private def listRel(f: FileSystem, zoneRoot: Path, dir: Path): Seq[String] =
    listRelInfo(f, zoneRoot, dir).map(_._1)

  /** Live bytes of a snapshot: from the committed per-file sizes when
    * they cover every file (zero FS calls), else one `getFileStatus`
    * per uncovered file (pre-sizes manifests). */
  private def committedBytes(f: FileSystem, zone: String, s: Snapshot): Long =
    s.files.map { rel =>
      s.sizes.get(rel).map(_._1).getOrElse(
        f.getFileStatus(new Path(zone.stripSuffix("/") + "/" + rel)).getLen)
    }.sum

  /** Bring an EXISTING plain directory zone under the log: gen 0 is the
    * zone's current recursive data-file listing. No-op if a log exists. */
  def init(spark: SparkSession, zone: String, format: String = "parquet"): Snapshot =
    latest(spark, zone).getOrElse {
      val root = fs(spark, zone).makeQualified(new Path(zone))
      val f = fs(spark, zone)
      val info =
        if (!f.exists(root)) Seq.empty
        else listRelInfo(f, root, root).filterNot(_._1.startsWith(LogDir))
      val files = info.map(_._1)
      val sizes = info.toMap
      publish(spark, zone, 0L, format, files,
        meta = Map("op" -> "init"), sizes = sizes) match {
        case Some(g) => Snapshot(g, format, files, sizes = sizes)
        // lost the init race: someone else published first — read them
        case None => latest(spark, zone).getOrElse(
          sys.error(s"txlog init of $zone lost the publish race"))
      }
    }

  /** CREATE an empty zone: one commit carrying the declared `schema`
    * (and the stats-column choice) with ZERO data files — the lake form
    * of `CREATE TABLE`, and what [[graft.sources.GraftCatalog]] runs for
    * the SQL statement. Unlike [[init]] (which adopts a directory's
    * existing files) or a replace of an empty frame (which writes a
    * zero-row part file just to carry the schema), the schema here lives
    * purely in the log — the zone is immediately a readable generation,
    * and the first append is an ordinary evolution-checked write.
    * Refuses a zone that already has a log: create is not an overwrite. */
  def create(spark: SparkSession, zone: String,
             schema: org.apache.spark.sql.types.StructType,
             statsCols: Seq[String] = Nil,
             format: String = "parquet"): Snapshot = {
    require(latest(spark, zone).isEmpty,
      s"txlog create: $zone already has a transaction log")
    val meta = Map("op" -> "create", "schema" -> schema.json) ++
      (if (statsCols.nonEmpty) Map("stats.cols" -> statsCols.mkString(","))
       else Map.empty)
    publish(spark, zone, 0L, format, Nil, meta) match {
      case Some(g) => Snapshot(g, format, Nil, meta)
      case None => sys.error(
        s"txlog create of $zone lost the publish race — a rival created it first")
    }
  }

  /** Publish a COPY-ON-WRITE group rewrite: drop `removed` (zone-relative
    * file names) and adopt every file already staged under `dataDir` as
    * ONE new generation — the commit half of SQL UPDATE / MERGE / rewrite
    * DELETE ([[graft.sources.TxLogTable]]'s row-level operations), where
    * Spark computes the touched files' full replacement rows and the
    * executors have written them. Write amplification is O(touched):
    * untouched files carry over with their stats; new files get stats
    * collected under the zone's tracked columns before the publish.
    *
    * Concurrency is PINNED, not last-writer-wins: the replacement rows
    * were computed from the snapshot at `expectedGen`, so a head that
    * moved mid-statement makes them stale — the staged files are deleted
    * and [[SnapshotMovedException]] thrown (the caller's statement
    * fails loudly; rerunning recomputes from the new head). The same
    * lost-update reasoning as [[replaceCas]]. */
  def commitRewrite(spark: SparkSession, zone: String, expectedGen: Long,
                    removed: Seq[String], dataDir: String,
                    op: String,
                    onlyFiles: Option[Set[String]] = None): Snapshot = {
    val f = fs(spark, zone)
    val root = f.makeQualified(new Path(zone))
    val dir = new Path(dataDir)
    def abortMoved(found: Long): Nothing = {
      f.delete(dir, true)
      throw new SnapshotMovedException(zone, expectedGen, found)
    }
    val head = latest(spark, zone).getOrElse(sys.error(
      s"txlog commitRewrite: $zone has no transaction log"))
    if (head.gen != expectedGen) abortMoved(head.gen)
    // `onlyFiles` (zone-relative) is the writers' own commit report: a
    // zombie/speculative task finishing its file AFTER the caller's
    // orphan sweep must not get that file adopted by a directory listing
    val newInfo = (if (f.exists(dir)) listRelInfo(f, root, dir) else Nil)
      .filter { case (p, _) => onlyFiles.forall(_.contains(p)) }
    val newFiles = newInfo.map(_._1)
    // a rewrite can legitimately produce ZERO replacement rows (a DELETE
    // matching every row of the touched files writes nothing — lazy
    // writers create no files, possibly not even the dir); reading the
    // empty/missing dir for stats would throw, so skip collection
    val (newStats, newColStats) =
      if (newFiles.isEmpty) (Map.empty[String, (Double, Double)],
        Map.empty[String, Map[String, ColStat]])
      else collectFileStats(spark, root, dir,
        head.format, head.meta.get("stats.col").filter(_.nonEmpty),
        effectiveStatsCols(Nil, head.meta), colMap(head.meta))
    val removedSet = removed.toSet
    val newSet = newFiles.toSet
    val nextFiles = (head.files.filterNot(removedSet) ++ newFiles).sorted
    val nextStats = head.stats.filter { case (p, _) => !removedSet(p) } ++
      newStats.filter { case (p, _) => newSet(p) }
    val nextColStats =
      head.colStats.filter { case (p, _) => !removedSet(p) } ++
        newColStats.filter { case (p, _) => newSet(p) }
    val nextSizes =
      head.sizes.filter { case (p, _) => !removedSet(p) } ++ newInfo.toMap
    publish(spark, zone, head.gen + 1, head.format, nextFiles,
      head.meta ++ Map("op" -> op), nextStats, nextColStats,
      base = Some(head), sizes = nextSizes) match {
      case Some(g) =>
        Snapshot(g, head.format, nextFiles, head.meta ++ Map("op" -> op),
          nextStats, nextColStats, base = head.gen, sizes = nextSizes)
      case None =>
        // a rival landed between the check and the claim
        abortMoved(latest(spark, zone).map(_.gen).getOrElse(-1L))
    }
  }

  /** META-ONLY commit: publish generation head+1 with the SAME file set
    * and `updatesFor(head)` folded into the meta — the primitive behind
    * DDL that changes what the log KNOWS without touching data (ALTER
    * TABLE ADD COLUMNS' schema evolution, stats-column re-targeting).
    * O(1) in table size: the delta commit records zero file actions,
    * only the new meta map. OCC like every commit — `updatesFor` runs
    * against each attempt's fresh head, so validation always sees the
    * state it will be applied to. */
  def commitMeta(spark: SparkSession, zone: String, op: String,
                 updatesFor: Snapshot => Map[String, String],
                 maxAttempts: Int = 5,
                 /** optional per-attempt stats transform (RENAME/DROP
                   * COLUMN re-key the logical-named stat entries in the
                   * same commit — still zero file actions) */
                 statsFor: Snapshot => Option[(Map[String, (Double, Double)],
                   Map[String, Map[String, ColStat]])] = _ => None): Snapshot = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    while (attempt < maxAttempts) {
      val head = latest(spark, zone).getOrElse(sys.error(
        s"txlog commitMeta($op): $zone has no transaction log"))
      val m = head.meta ++ updatesFor(head) ++ Map("op" -> op)
      val (st, cst) = statsFor(head).getOrElse((head.stats, head.colStats))
      publish(spark, zone, head.gen + 1, head.format, head.files, m,
        st, cst, base = Some(head),
        sizes = head.sizes) match {
        case Some(g) =>
          return Snapshot(g, head.format, head.files, m, st,
            cst, base = head.gen, sizes = head.sizes)
        case None => ()
      }
      attempt += 1
      Thread.sleep(math.min(200L, 10L * attempt))
    }
    sys.error(s"txlog commitMeta($op) on $zone conflicted $maxAttempts times")
  }

  /** ALTER TABLE ADD COLUMNS: append `fields` to the tracked schema in
    * one meta-only commit — no data file is touched; files written
    * before the evolution surface the new columns as null through the
    * log-schema read ([[loadFiles]]), exactly like a column added by an
    * evolved append. Added columns must be NULLABLE (old files cannot
    * retroactively carry values) and must not collide case-insensitively
    * (Spark's resolution). Renames/drops ride the column-mapping layer
    * ([[renameColumn]]/[[dropColumn]] — meta-only, name-mapped); a
    * RETYPE is still a rewrite ([[replaceCas]]: read, retype, replace),
    * because no mapping can change what committed bytes decode to. */
  def addColumns(spark: SparkSession, zone: String,
                 fields: Seq[org.apache.spark.sql.types.StructField]): Snapshot = {
    require(fields.nonEmpty, "txlog addColumns: no columns given")
    // duplicates within ONE call would commit a schema with duplicate
    // columns — corrupt until manually repaired; the per-field check
    // below only sees the pre-call schema
    require(fields.map(_.name.toLowerCase(java.util.Locale.ROOT))
        .distinct.size == fields.size,
      s"txlog addColumns: duplicate column names in ${fields.map(_.name)}")
    commitMeta(spark, zone, "add-columns", head => {
      val current = zoneSchema(head).getOrElse(
        if (head.files.nonEmpty) readSnapshot(spark, zone, head).schema
        else sys.error(s"txlog addColumns: $zone tracks no schema and has " +
          "no files to infer one from"))
      val existing = current.fieldNames
        .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      fields.foreach { fl =>
        require(fl.nullable, s"txlog addColumns: ${fl.name} must be nullable " +
          "— files written before the evolution surface null")
        require(!existing(fl.name.toLowerCase(java.util.Locale.ROOT)),
          s"txlog addColumns: column ${fl.name} already exists")
      }
      // a name RETIRED by a drop/rename may be re-added, but its bytes
      // must not resurface from old files: map the new logical name to a
      // fresh physical name (generation-stamped — unique, deterministic).
      // Membership is CASE-INSENSITIVE, matching Spark's default parquet
      // field resolution: dropping `v` then re-adding `V` would otherwise
      // bypass the tombstone and read the dropped bytes.
      val used = usedPhysical(head.meta)
      val cmap = colMap(head.meta)
      val takenLc = (used ++ cmap.values ++ current.fieldNames)
        .map(_.toLowerCase(java.util.Locale.ROOT))
      val freshEntries = fields.collect {
        case fl if takenLc(fl.name.toLowerCase(java.util.Locale.ROOT)) =>
          fl.name -> s"${fl.name}__g${head.gen + 1}"
      }
      val mapMeta =
        if (freshEntries.isEmpty) Map.empty[String, String]
        else Map("colmap" -> encodeColMap(cmap ++ freshEntries))
      Map("schema" ->
        org.apache.spark.sql.types.StructType(current.fields ++ fields).json) ++
        mapMeta
    })
  }

  /** ALTER TABLE RENAME COLUMN, without touching a single data file: the
    * column's bytes keep their on-disk (physical) name; the commit moves
    * only the LOGICAL name — new schema, a `colmap` entry pointing the
    * new name at the old physical, a tombstone so the freed name can
    * never alias old bytes, and the logical-keyed stat entries re-keyed
    * in place. Reads at any older generation use that generation's own
    * mapping, so time travel across the rename shows each era's names.
    * Top-level fields only. */
  def renameColumn(spark: SparkSession, zone: String,
                   from: String, to: String): Snapshot = {
    require(from != to, s"txlog renameColumn: '$from' -> '$to' is a no-op")
    def updates(head: Snapshot): Map[String, String] = {
      val current = zoneSchema(head).getOrElse(sys.error(
        s"txlog renameColumn: $zone tracks no schema"))
      require(current.fieldNames.contains(from),
        s"txlog renameColumn: no column '$from' in ${current.fieldNames.mkString(", ")}")
      require(!current.fieldNames.exists(n => n != from &&
          n.equalsIgnoreCase(to)),
        s"txlog renameColumn: column '$to' already exists")
      val cmap = colMap(head.meta)
      val phys = cmap.getOrElse(from, from)
      val nextMap = (cmap - from) ++
        (if (to == phys) Map.empty[String, String] else Map(to -> phys))
      // tombstone the freed LOGICAL name iff it is a physical name some
      // file actually carries (phys == from when never mapped before)
      val nextUsed = usedPhysical(head.meta) ++
        (if (phys == from) Set(from) else Set.empty[String])
      val newSchema = org.apache.spark.sql.types.StructType(
        current.fields.map(f => if (f.name == from) f.copy(name = to) else f))
      val statsColMeta = head.meta.get("stats.col") match {
        case Some(c) if c == from => Map("stats.col" -> to)
        case _ => Map.empty[String, String]
      }
      val statsColsMeta = head.meta.get("stats.cols") match {
        case Some(cs) if cs.split(",").contains(from) =>
          Map("stats.cols" -> cs.split(",").map(c =>
            if (c == from) to else c).mkString(","))
        case _ => Map.empty[String, String]
      }
      Map("schema" -> newSchema.json,
        "colmap" -> encodeColMap(nextMap),
        "colmap.used" -> nextUsed.toSeq.sorted.map(encName).mkString(",")) ++
        statsColMeta ++ statsColsMeta
    }
    commitMeta(spark, zone, "rename-column", updates,
      statsFor = head => Some((head.stats,
        // stats are LOGICAL-keyed: re-key this column's entries so
        // pruning keeps working under the new name, same commit
        head.colStats.map { case (file, perCol) =>
          file -> perCol.map { case (c, st) =>
            (if (c == from) to else c) -> st }
        })))
  }

  /** ALTER TABLE DROP COLUMN, meta-only: the schema shrinks, the bytes
    * stay in the files (unread — the log schema is what every read
    * requests), the physical name is tombstoned so a later re-add can
    * never resurrect them, and the column's stat entries drop. The LAST
    * column cannot be dropped. */
  def dropColumn(spark: SparkSession, zone: String, name: String): Snapshot = {
    def updates(head: Snapshot): Map[String, String] = {
      val current = zoneSchema(head).getOrElse(sys.error(
        s"txlog dropColumn: $zone tracks no schema"))
      require(current.fieldNames.contains(name),
        s"txlog dropColumn: no column '$name' in ${current.fieldNames.mkString(", ")}")
      require(current.fields.length > 1,
        s"txlog dropColumn: cannot drop the last column '$name'")
      val cmap = colMap(head.meta)
      val phys = cmap.getOrElse(name, name)
      val nextUsed = usedPhysical(head.meta) + phys
      val newSchema = org.apache.spark.sql.types.StructType(
        current.fields.filterNot(_.name == name))
      val statsColMeta: Map[String, String] =
        if (head.meta.get("stats.col").contains(name)) Map.empty
        else head.meta.get("stats.col").map("stats.col" -> _).toMap
      val statsColsMeta = head.meta.get("stats.cols") match {
        case Some(cs) if cs.split(",").contains(name) =>
          Map("stats.cols" -> cs.split(",").filterNot(_ == name).mkString(","))
        case _ => Map.empty[String, String]
      }
      // NB: meta is MERGED (head.meta ++ updates), so a dropped stats.col
      // must be erased via the sentinel below, not by omission
      Map("schema" -> newSchema.json,
        "colmap" -> encodeColMap(cmap - name),
        "colmap.used" -> nextUsed.toSeq.sorted.map(encName).mkString(",")) ++
        statsColMeta ++ statsColsMeta ++
        (if (head.meta.get("stats.col").contains(name))
           Map("stats.col" -> "") else Map.empty)
    }
    val snap = commitMeta(spark, zone, "drop-column", updates,
      statsFor = head => Some((
        if (head.meta.get("stats.col").contains(name)) Map.empty
        else head.stats,
        head.colStats.map { case (file, perCol) => file -> (perCol - name) })))
    snap
  }

  /** Is `from -> to` a widening every committed byte decodes into
    * LOSSLESSLY through the parquet readers' type promotion (verified on
    * this Spark: int family up-casts, int family → double, float →
    * double, decimal precision/scale-up keeping integer digits)? The
    * Delta type-widening feature's safe set; long → double is EXCLUDED
    * (53-bit mantissa truncates large longs). */
  private[graft] def isSafeWidening(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    val intRank = Map[DataType, Int](
      ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
    (from, to) match {
      case (f, t) if f == t => false
      case (f, t) if intRank.contains(f) && intRank.contains(t) =>
        intRank(t) > intRank(f)
      case (f, DoubleType) if intRank.contains(f) && f != LongType => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.precision - t.scale >= f.precision - f.scale && t.scale >= f.scale
      case _ => false
    }
  }

  /** ALTER TABLE ALTER COLUMN TYPE for SAFE WIDENINGS, meta-only (the
    * Delta type-widening precedent): the tracked schema's field retypes;
    * not one data file is touched — old files' narrower values promote
    * losslessly through the parquet readers' type promotion at scan
    * time, new writes land in the widened type, and time travel shows
    * each era's type (every generation keeps its own schema meta).
    * Committed per-file stats stay valid verbatim: a min/max of the old
    * values bounds the same values under the wider type, and "num"-kind
    * pruning compares as doubles either way. Narrowing or incompatible
    * retypes refuse loudly — they change what committed bytes decode to,
    * which only a rewrite ([[replaceCas]]) can do. Composes with the
    * column-mapping layer: the physical name (and therefore the files'
    * bytes) is untouched, so a widen after a rename keeps reading
    * through the same mapping. */
  def widenColumn(spark: SparkSession, zone: String, name: String,
                  to: org.apache.spark.sql.types.DataType): Snapshot =
    commitMeta(spark, zone, "widen-column", head => {
      val current = zoneSchema(head).getOrElse(sys.error(
        s"txlog widenColumn: $zone tracks no schema"))
      val field = current.fields.find(_.name == name).getOrElse(sys.error(
        s"txlog widenColumn: no column '$name' in ${current.fieldNames.mkString(", ")}"))
      require(isSafeWidening(field.dataType, to),
        s"txlog widenColumn: ${field.dataType.simpleString} -> " +
          s"${to.simpleString} is not a safe widening (safe: integer " +
          "up-casts, int->double, float->double, decimal precision/scale-up " +
          "keeping integer digits) — a narrowing/incompatible retype is a " +
          "rewrite (replaceCas / INSERT OVERWRITE with the new types)")
      Map("schema" -> org.apache.spark.sql.types.StructType(
        current.fields.map(f =>
          if (f.name == name) f.copy(dataType = to) else f)).json)
    })

  /** Re-target which columns FUTURE commits collect per-file stats for
    * (the `stats.cols` choice writes otherwise inherit). Meta-only:
    * already-committed files keep the stats they have; the next
    * append/replace/compact stamps the new set. Empty = stop tracking. */
  def setStatsCols(spark: SparkSession, zone: String,
                   cols: Seq[String]): Snapshot =
    commitMeta(spark, zone, "set-stats-cols", head => {
      val schemaNames = zoneSchema(head).map(_.fieldNames.toSet)
      cols.foreach { c =>
        require(schemaNames.forall(_.contains(c)),
          s"txlog setStatsCols: $c is not a column of the tracked schema")
      }
      Map("stats.cols" -> cols.mkString(","))
    })

  /** Read the zone at its newest complete snapshot. A zone without a log
    * is read as a plain directory (migration path). */
  def read(spark: SparkSession, zone: String): DataFrame =
    latest(spark, zone) match {
      case Some(s) => readSnapshot(spark, zone, s)
      case None    => spark.read.parquet(zone)
    }

  /** Read a SPECIFIC snapshot — stable under concurrent publishes, valid
    * until `vacuum` retention passes it. */
  def readSnapshot(spark: SparkSession, zone: String, s: Snapshot): DataFrame = {
    val paths = s.resolve(zone)
    if (paths.isEmpty) spark.emptyDataFrame
    else loadFiles(spark, s, paths)
  }

  // ---- schema tracking / evolution -----------------------------------------

  /** The zone's committed schema, if the log tracks one (the `schema`
    * meta key, written by every [[append]]/[[replace]] since schema
    * tracking landed; zones last written before that read by per-file
    * inference, exactly as before). */
  def zoneSchema(s: Snapshot): Option[org.apache.spark.sql.types.StructType] =
    s.meta.get("schema").map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  // ---- column mapping (RENAME/DROP without rewriting data) ------------------

  /** Column mapping, the Delta/Iceberg name-mapping idea in its simplest
    * form: data files keep the column name a field had when it was FIRST
    * written (its PHYSICAL name, immutable for the file's life); the
    * manifest's `colmap` meta records `logical -> physical` for every
    * field whose current (logical) name differs. RENAME COLUMN is then a
    * meta-only commit (the physical name stays; reads translate), DROP
    * is a schema shrink, and a column RE-ADDED under a dropped/renamed
    * name gets a FRESH physical name (`colmap.used` tombstones every
    * physical name ever retired) so old files' bytes can never resurface
    * under the new column. Rewrite-everything commits (replace, compact,
    * OPTIMIZE) write logical names and RESET the mapping — maintenance
    * normalizes the physical layout for free. Top-level fields only
    * (nested renames need per-file ID mapping — out of scope). */
  private[graft] def colMap(meta: Map[String, String]): Map[String, String] =
    meta.get("colmap").filter(_.nonEmpty).map(_.split(",").iterator.map { p =>
      val i = p.indexOf(':')
      (decName(p.substring(0, i)), decName(p.substring(i + 1)))
    }.toMap).getOrElse(Map.empty)

  private def encodeColMap(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (l, p) => encName(l) + ":" + encName(p) }
      .mkString(",")

  /** The encoder, for the catalog's combined ALTER commit (which folds a
    * fresh-physical ADD into the same meta commit as its statsCols). */
  private[graft] def encodeColMapPublic(m: Map[String, String]): String =
    encodeColMap(m)

  /** Physical names no future column may claim: every physical name a
    * drop or rename retired from its logical slot. */
  private[graft] def usedPhysical(meta: Map[String, String]): Set[String] =
    meta.get("colmap.used").filter(_.nonEmpty)
      .map(_.split(",").iterator.map(decName).toSet).getOrElse(Set.empty)

  private def encName(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def decName(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  /** The physical name a logical column's bytes live under. */
  private[graft] def physicalOf(meta: Map[String, String], logical: String): String =
    colMap(meta).getOrElse(logical, logical)

  /** The snapshot's schema with every field under its PHYSICAL name —
    * what the per-file reader must request. */
  private[graft] def physicalSchema(s: Snapshot)
      : Option[org.apache.spark.sql.types.StructType] = {
    val m = colMap(s.meta)
    zoneSchema(s).map { sch =>
      if (m.isEmpty) sch
      else org.apache.spark.sql.types.StructType(
        sch.fields.map(f => f.copy(name = m.getOrElse(f.name, f.name))))
    }
  }

  /** Rename an outgoing frame's columns logical -> physical before the
    * file write (appends/merges must keep each column's on-disk name
    * stable across renames so ONE read schema serves every file). */
  private def toPhysical(df: DataFrame, colmap: Map[String, String]): DataFrame =
    if (colmap.isEmpty || !df.columns.exists(colmap.contains)) df
    else df.select(df.columns.map(c =>
      org.apache.spark.sql.functions.col(c)
        .as(colmap.getOrElse(c, c))).toIndexedSeq: _*)

  private val ColMapMetaKeys = Seq("colmap", "colmap.used")

  /** Load data files under a snapshot's tracked schema (Delta-style: the
    * schema lives in the LOG, so an evolved zone never pays per-file
    * footer merging — `mergeSchema` at 100 TB reads every footer on
    * every plan; this reads none). Files written before a column was
    * added simply surface it as null. Falls back to source inference for
    * pre-tracking zones. Under a column mapping the files are requested
    * by PHYSICAL name and the frame surfaces logical names (a pure
    * positional rename — zero cost in the plan). */
  private[graft] def loadFiles(spark: SparkSession, s: Snapshot,
                               paths: Seq[String]): DataFrame = {
    val r = spark.read.format(s.format)
    val df = physicalSchema(s).fold(r)(r.schema).load(paths: _*)
    val logical = zoneSchema(s)
    if (logical.exists(_.fieldNames.toSeq != df.columns.toSeq))
      df.toDF(logical.get.fieldNames.toIndexedSeq: _*)
    else df
  }

  /** Merge an incoming write's schema into the zone's: matched columns
    * must keep their exact type (no silent widening — a type change is a
    * rewrite, not an append), new columns append at the end as nullable
    * (old files lack them → null), and columns the write omits stay,
    * nullable (its new files lack them → null). Field names match
    * case-sensitively — the manifest is the single source of truth, so
    * there is no engine-config ambiguity to respect. */
  private[graft] def mergeSchemas(base: org.apache.spark.sql.types.StructType,
                                  next: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val kept = base.fields.map { bf =>
      next.fields.find(_.name == bf.name) match {
        case Some(nf) =>
          require(nf.dataType == bf.dataType,
            s"schema evolution cannot change column '${bf.name}' from " +
              s"${bf.dataType.simpleString} to ${nf.dataType.simpleString} — " +
              "rewrite the zone (replace) to retype")
          bf.copy(nullable = bf.nullable || nf.nullable)
        case None => bf.copy(nullable = true)
      }
    }
    val baseNames = base.fieldNames.toSet
    val added = next.fields.filterNot(f => baseNames(f.name))
      .map(_.copy(nullable = true))
    org.apache.spark.sql.types.StructType(kept ++ added)
  }

  /** The schema this append commits: the head's tracked schema (or, for
    * a pre-tracking zone with data, its inferred read schema — one-time
    * bootstrap) merged with the incoming frame's. */
  private def evolvedSchema(spark: SparkSession, zone: String, head: Snapshot,
                            df: DataFrame)
      : org.apache.spark.sql.types.StructType = {
    val base = zoneSchema(head).orElse(
      if (head.files.nonEmpty) Some(readSnapshot(spark, zone, head).schema)
      else None)
    base.fold(df.schema)(mergeSchemas(_, df.schema))
  }

  /** Per-file stats over the files just written to `dataDir` — the legacy
    * single-column doubles (`legacyCol`) and the typed multi-column
    * min/max/null-counts (`typedCols`) computed in ONE bounded extra scan
    * of the new files, all columns aggregated in the same
    * `groupBy(input_file_name)` job (Delta-style stats collection; a zone
    * carrying both meta keys must not pay two read passes per commit).
    * Legacy entries with a null/NaN bound are dropped (those files are
    * always read). Typed numeric columns record doubles ("num");
    * everything else records its string form ("str" — ISO date/timestamp
    * strings order chronologically). */
  private def collectFileStats(spark: SparkSession, root: Path, dataDir: Path,
                               format: String, legacyCol: Option[String],
                               typedCols: Seq[String],
                               colmap: Map[String, String] = Map.empty)
      : (Map[String, (Double, Double)], Map[String, Map[String, ColStat]]) = {
    if (legacyCol.isEmpty && typedCols.isEmpty) return (Map.empty, Map.empty)
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min, when}
    // stats are keyed by LOGICAL column names throughout the manifest;
    // freshly-written files carry physical names, so surface them
    // logically before aggregating
    val dfRaw = spark.read.format(format).load(dataDir.toString)
    val rev = colmap.map(_.swap)
    val df =
      if (rev.isEmpty || !dfRaw.columns.exists(rev.contains)) dfRaw
      else dfRaw.toDF(dfRaw.columns.map(c => rev.getOrElse(c, c)).toIndexedSeq: _*)
    val kinds = typedCols.map { c =>
      c -> (df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => "num"
        case _ => "str"
      })
    }.toMap
    val legacyAggs = legacyCol.toSeq.flatMap { c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double")))
    }
    val typedAggs = typedCols.flatMap { c =>
      val v = if (kinds(c) == "num") col(c).cast("double") else col(c).cast("string")
      Seq(min(v), max(v), count(when(col(c).isNull, 1)))
    }
    val aggs = count(lit(1)).as("_rows") +: (legacyAggs ++ typedAggs)
    val rootPath = root.toUri.getPath.stripSuffix("/")
    val rows = df.groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val typedBase = 2 + legacyAggs.size
    val legacy = rows.flatMap { r =>
      if (legacyCol.isEmpty || r.isNullAt(2) || r.isNullAt(3)) None
      else {
        val (mn, mx) = (r.getDouble(2), r.getDouble(3))
        if (mn.isNaN || mx.isNaN) None
        else {
          val rel = new Path(new java.net.URI(r.getString(0))).toUri.getPath
            .stripPrefix(rootPath).stripPrefix("/")
          Some(rel -> (mn, mx))
        }
      }
    }.toMap
    val typed =
      if (typedCols.isEmpty) Map.empty[String, Map[String, ColStat]]
      else rows.map { r =>
        val rel = new Path(new java.net.URI(r.getString(0))).toUri.getPath
          .stripPrefix(rootPath).stripPrefix("/")
        val nRows = r.getLong(1)
        val perCol = typedCols.zipWithIndex.map { case (c, i) =>
          val base = typedBase + i * 3
          def v(at: Int): Option[String] =
            if (r.isNullAt(at)) None else Some(r.get(at).toString)
          c -> ColStat(kinds(c), nRows, r.getLong(base + 2), v(base), v(base + 1))
        }.toMap
        rel -> perCol
      }.toMap
    // ZERO-ROW files (an empty write partition — e.g. a merge whose
    // touched side vanished entirely) never appear in the
    // groupBy(input_file_name) result, which would leave them stat-less:
    // every stats read then treats them as "unknown, must scan" and
    // metadataCount refuses the zone. Record them explicitly as
    // rows=0 / all-null stats — pruning then correctly always skips them
    // and the row count stays exact.
    val typedFilled =
      if (typedCols.isEmpty) typed
      else {
        val seen = typed.keySet
        val empties = listRel(
          dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration),
          root, dataDir).filterNot(seen)
        typed ++ empties.map(rel =>
          rel -> typedCols.map(c => c -> ColStat(kinds(c), 0L, 0L, None, None)).toMap)
      }
    (legacy, typedFilled)
  }

  /** The stats columns a zone tracks: this write's request, else the
    * zone's committed choice (so stats survive writers that don't repeat
    * the option). */
  private def effectiveStatsCols(statsCols: Seq[String],
                                 headMeta: Map[String, String]): Seq[String] =
    if (statsCols.nonEmpty) statsCols
    else headMeta.get("stats.cols").map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Nil)

  /** Append `df` as a new generation: new files land in a fresh
    * `d-<uuid>/` dir, the manifest is head.files ++ new files. On a lost
    * publish race the file list is recomputed against the new head and
    * retried — appends never conflict on data, only on the gen number.
    * With `statsCol`, per-file min/max of that column are committed in
    * the same manifest, enabling [[readWhere]] file skipping. */
  def append(spark: SparkSession, zone: String, df: DataFrame,
             maxRetries: Int = 5,
             meta: Map[String, String] = Map.empty,
             statsCol: Option[String] = None,
             statsCols: Seq[String] = Nil): Snapshot =
    appendImpl(spark, zone, df, maxRetries, meta, statsCol, statsCols,
      batchId = None)
      .getOrElse(sys.error("unreachable: append without a batchId never skips"))

  /** Shared append body. With `batchId`, the committed high-water mark is
    * re-checked against the CURRENT head inside the publish retry loop —
    * closing the check-then-act window where two writers replaying the
    * same batch could both commit (the loser's rebase would otherwise
    * keep its rows). Returns None when the batch was already committed
    * (the staged data dir is removed). */
  private def appendImpl(spark: SparkSession, zone: String, df: DataFrame,
                         maxRetries: Int, meta: Map[String, String],
                         statsCol: Option[String], statsCols: Seq[String],
                         batchId: Option[Long]): Option[Snapshot] = {
    val f = fs(spark, zone)
    val root = f.makeQualified(new Path(zone))
    val dataDir = new Path(root, "d-" + UUID.randomUUID().toString.take(8))
    val head0 = latest(spark, zone).getOrElse(init(spark, zone))
    // write under PHYSICAL names (stable across renames; a frame column
    // the mapping doesn't know is new — its physical name IS its name)
    val cmap = colMap(head0.meta)
    val used = usedPhysical(head0.meta)
    if (used.nonEmpty) {
      // an evolution-append may not claim a RETIRED physical name: old
      // files still carry those bytes and would resurface under the new
      // column. ALTER TABLE ADD COLUMNS assigns a fresh physical name.
      // Case-insensitive on both sides (Spark's parquet resolution): a
      // case-variant of a tracked column IS that column (not new), and a
      // case-variant of a tombstoned name would alias the dropped bytes.
      def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
      val knownLc = zoneSchema(head0)
        .map(_.fieldNames.map(lc).toSet).getOrElse(Set.empty)
      val usedLc = used.map(lc)
      val clash = df.columns.filterNot(c => knownLc(lc(c)))
        .filter(c => usedLc(lc(c)))
      require(clash.isEmpty,
        s"txlog append: column(s) ${clash.mkString(", ")} reuse a physical " +
          "name retired by a drop/rename — add them via ALTER TABLE ADD " +
          "COLUMNS (addColumns), which maps them to a fresh physical name")
    }
    toPhysical(df, cmap).write.mode(SaveMode.ErrorIfExists)
      .format(head0.format).save(dataDir.toString)
    val addedInfo = listRelInfo(f, root, dataDir)
    val added = addedInfo.map(_._1)
    val cName = statsCol.orElse(head0.meta.get("stats.col")).filter(_.nonEmpty)
    val tCols = effectiveStatsCols(statsCols, head0.meta)
    val (addedStats, addedColStats) =
      collectFileStats(spark, root, dataDir, head0.format, cName, tCols, cmap)
    val statsMeta = cName.map(c => Map("stats.col" -> c)).getOrElse(Map.empty) ++
      (if (tCols.nonEmpty) Map("stats.cols" -> tCols.mkString(",")) else Map.empty)
    var attempt = 0
    while (attempt <= maxRetries) {
      val head = latest(spark, zone).getOrElse(head0)
      if (batchId.exists(b =>
        head.meta.get("batchId").exists(_.toLong >= b))) {
        f.delete(dataDir, true)
        return None
      }
      // carry earlier generations' metadata forward (e.g. the streaming
      // sink's batchId high-water mark); this publish's keys override.
      // distinct: after a fork-check abort a successor may have carried
      // our `added` files forward already — re-listing them here would
      // read every appended row twice (data files are uuid-named, so
      // distinct never merges genuinely different files)
      // schema evolves against the CURRENT head each attempt — a rival
      // append that won the race may have added its own columns, and the
      // rebase must merge with those, not with the stale head0 view
      val schemaMeta =
        Map("schema" -> evolvedSchema(spark, zone, head, df).json)
      val next = Snapshot(head.gen + 1, head.format,
        (head.files ++ added).distinct.sorted,
        head.meta ++ statsMeta ++ schemaMeta ++ meta ++ Map("op" -> "append"),
        head.stats ++ addedStats, head.colStats ++ addedColStats,
        base = head.gen, sizes = head.sizes ++ addedInfo.toMap)
      publish(spark, zone, next.gen, next.format, next.files, next.meta,
        next.stats, next.colStats, base = Some(head),
        sizes = next.sizes) match {
        // base stays head.gen even when publish skip-forwarded past a
        // corpse (g > head.gen + 1) — it names the REBASED head, exactly
        // what the on-disk manifest records
        case Some(g) => return Some(next.copy(gen = g))
        case None => ()
      }
      attempt += 1
      // the racing winner may still be mid-manifest-write (invisible to
      // latest()); back off so the rebase sees its completed head
      Thread.sleep(math.min(200L, 10L * attempt))
    }
    f.delete(dataDir, true)
    sys.error(s"txlog append to $zone lost the publish race $maxRetries times")
  }

  /** The live files a range predicate on the stats column can touch:
    * files without stats are kept (never skip blind), files whose
    * [min, max] misses [lo, hi] are pruned. */
  def prunedFiles(s: Snapshot, lo: Double, hi: Double): Seq[String] =
    s.files.filter { f =>
      s.stats.get(f) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }

  /** Range read with manifest-based file skipping: scans ONLY the files
    * whose committed min/max overlap [lo, hi] (plus stat-less files),
    * then applies the exact predicate. At 100 TB this is the difference
    * between touching 3 files and 800k — the reason the stats live in
    * the manifest. The zone must have been written with a `statsCol`. */
  def readWhere(spark: SparkSession, zone: String,
                lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    val head = latest(spark, zone).getOrElse(
      sys.error(s"$zone has no transaction log"))
    // .filter(_.nonEmpty): dropColumn erases a dropped stats.col via the
    // "" sentinel (meta is merged, not replaced) — without the filter this
    // would build col("") and fail with an unresolved-column error instead
    // of the intended message (same guard as every other read site)
    val cName = head.meta.get("stats.col").filter(_.nonEmpty).getOrElse(
      sys.error(s"$zone has no stats column — write with statsCol to enable skipping"))
    val pred = col(cName).cast("double") >= lo && col(cName).cast("double") <= hi
    val keep = prunedFiles(head, lo, hi)
    if (keep.isEmpty) readSnapshot(spark, zone, head).filter(org.apache.spark.sql.functions.lit(false))
    else loadFiles(spark, head, keep.map(f => zone.stripSuffix("/") + "/" + f))
      .filter(pred)
  }

  /** Common-prefix string comparison for "str" stats: compares only the
    * first min(len) characters and reports 0 when one side is a prefix of
    * the other. A strict prefix inequality implies the same strict full-
    * string inequality, so pruning on it is sound for ANY strings — and
    * it is what makes mixed-granularity chronological bounds safe: a
    * DATE-typed stat "1996-01-01" against a caller bound
    * "1996-01-01 00:00:00" compares EQUAL (ambiguous → keep) instead of
    * lexicographically smaller (which would prune a file whose rows the
    * exact predicate then matches — silently missing data). */
  private def cmpPrefix(a: String, b: String): Int = {
    val k = math.min(a.length, b.length)
    a.substring(0, k).compareTo(b.substring(0, k))
  }

  /** Files a range predicate on `column` can touch under the TYPED stats:
    * files without a stat for the column are kept (never skip blind);
    * files whose [min, max] misses [lo, hi] — compared as doubles for
    * "num" columns, by [[cmpPrefix]] for "str" (prune only on a STRICT
    * common-prefix inequality, so bound formats of finer or coarser
    * granularity than the stat strings can never prune a qualifying
    * file) — are pruned, as are files where the column is entirely null
    * (a range predicate is null-rejecting). NaN bounds keep the file. */
  def prunedFilesFor(s: Snapshot, column: String, lo: Any, hi: Any): Seq[String] =
    s.files.filter { f =>
      s.colStats.get(f).flatMap(_.get(column)) match {
        case Some(st) => (st.min, st.max) match {
          case (Some(mn), Some(mx)) if st.kind == "num" =>
            val (l, h) = (lo.toString.toDouble, hi.toString.toDouble)
            val (m, x) = (mn.toDouble, mx.toDouble)
            m.isNaN || x.isNaN || (x >= l && m <= h)
          case (Some(mn), Some(mx)) =>
            cmpPrefix(mx, lo.toString) >= 0 && cmpPrefix(mn, hi.toString) <= 0
          case _ => false // entirely-null column: no row can pass the range
        }
        case None => true
      }
    }

  /** Typed-stats range read: scans ONLY the files whose committed
    * min/max for `column` overlap [lo, hi], then applies the exact
    * predicate. The multi-column twin of [[readWhere]]; the zone must
    * have been written with `statsCols` including `column`. */
  /** Range predicate that keeps PARQUET PUSHDOWN alive: the literal is
    * cast to the COLUMN's native type, never the column to the
    * literal's — a cast around the column makes the filter opaque to the
    * scan, losing the row-group min/max skipping INSIDE each file that
    * manifest-level pruning composes with. Bounds must be representable
    * in the column's type (e.g. no fractional bounds on an integer
    * column) — under ANSI the constant-folded cast fails loudly at plan
    * time rather than silently filtering everything. */
  private def nativeRangePred(df: DataFrame, column: String,
                              lo: Any, hi: Any): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    val dt = df.schema(column).dataType
    col(column) >= lit(lo.toString).cast(dt) &&
      col(column) <= lit(hi.toString).cast(dt)
  }

  def readWhereCol(spark: SparkSession, zone: String, column: String,
                   lo: Any, hi: Any): DataFrame = {
    val head = latest(spark, zone).getOrElse(
      sys.error(s"$zone has no transaction log"))
    val tracked = head.meta.getOrElse("stats.cols", "").split(",")
    require(tracked.contains(column),
      s"$zone does not track stats for '$column' (tracked: ${tracked.mkString(",")}) " +
        "— write with statsCols to enable skipping")
    val keep = prunedFilesFor(head, column, lo, hi)
    if (keep.isEmpty)
      readSnapshot(spark, zone, head).filter(org.apache.spark.sql.functions.lit(false))
    else {
      val df = loadFiles(spark, head, keep.map(f => zone.stripSuffix("/") + "/" + f))
      df.filter(nativeRangePred(df, column, lo, hi))
    }
  }

  /** Conjunctive multi-column range read: a file is scanned only if its
    * stats overlap EVERY column's range — the read shape a Z-ordered
    * layout exists for ([[Layout.clusterByZ]] makes per-file min/max
    * tight on every clustered column simultaneously, so the intersection
    * of the per-column keep-lists is small). Exact predicates are applied
    * after, as always. */
  def readWhereCols(spark: SparkSession, zone: String,
                    preds: Seq[(String, Any, Any)]): DataFrame = {
    require(preds.nonEmpty, "readWhereCols needs at least one range predicate")
    val head = latest(spark, zone).getOrElse(
      sys.error(s"$zone has no transaction log"))
    val keep = preds.foldLeft(head.files) { case (files, (c, lo, hi)) =>
      val perCol = prunedFilesFor(head, c, lo, hi).toSet
      files.filter(perCol)
    }
    if (keep.isEmpty)
      readSnapshot(spark, zone, head).filter(org.apache.spark.sql.functions.lit(false))
    else {
      val df = loadFiles(spark, head, keep.map(f => zone.stripSuffix("/") + "/" + f))
      df.filter(preds.map { case (c, lo, hi) => nativeRangePred(df, c, lo, hi) }
        .reduce(_ && _))
    }
  }

  /** Null-count-based skipping: read the zone for an IS NOT NULL query on
    * `column`, scanning only files where at least one row is non-null. */
  def readWhereNotNull(spark: SparkSession, zone: String, column: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val head = latest(spark, zone).getOrElse(
      sys.error(s"$zone has no transaction log"))
    val keep = head.files.filter { f =>
      head.colStats.get(f).flatMap(_.get(column)) match {
        case Some(st) => st.nulls < st.rows
        case None => true
      }
    }
    if (keep.isEmpty)
      readSnapshot(spark, zone, head).filter(org.apache.spark.sql.functions.lit(false))
    else loadFiles(spark, head, keep.map(f => zone.stripSuffix("/") + "/" + f))
      .filter(col(column).isNotNull)
  }

  /** Thrown by [[replace]] when `expectedBase` validation fails: the head
    * generation moved past the snapshot this replacement was computed
    * from. The staged data files are already cleaned up when this
    * propagates; the caller re-reads the head, recomputes, and retries —
    * or uses [[replaceCas]], which runs exactly that loop. */
  final class SnapshotMovedException(val zone: String,
                                     val expected: Long, val found: Long)
    extends RuntimeException(
      s"txlog replace of $zone: base generation moved ($expected -> $found); " +
        "recompute against the new head and retry")

  /** Atomically REPLACE the zone's content with `df` as a new generation
    * — the transactional form of `mode("overwrite")`: a reader holding
    * the previous snapshot keeps reading its (immutable) files; a reader
    * arriving mid-write sees the previous complete generation until the
    * single publish flips the head.
    *
    * Concurrency is the caller's choice via `expectedBase`:
    *  - None (default): last-writer-wins by intent — a lost publish race
    *    just rebases on the new head and re-claims the next number. Right
    *    when `df` does not depend on the zone's current content (a full
    *    reload from an upstream source).
    *  - Some(gen): OPTIMISTIC concurrency — publish only while the head
    *    is still `gen`; a moved head (a rival replace/append/compact
    *    landed after this caller read its snapshot) deletes the staged
    *    files and throws [[SnapshotMovedException]] instead of silently
    *    overwriting the rival's commit with content computed from a
    *    STALE read. Blind last-write-wins here is the lost-update
    *    anomaly; aborting is what makes read-modify-write transforms
    *    safe. [[replaceCas]] is the retry loop packaged. */
  def replace(spark: SparkSession, zone: String, df: DataFrame,
              maxRetries: Int = 5,
              meta: Map[String, String] = Map.empty,
              statsCol: Option[String] = None,
              statsCols: Seq[String] = Nil,
              expectedBase: Option[Long] = None): Snapshot = {
    val f = fs(spark, zone)
    val root = f.makeQualified(new Path(zone))
    val dataDir = new Path(root, "d-" + UUID.randomUUID().toString.take(8))
    val head0 = latest(spark, zone).getOrElse(init(spark, zone))
    expectedBase.filter(_ != head0.gen).foreach { eg =>
      // moved before any data was even staged — cheapest abort
      throw new SnapshotMovedException(zone, eg, head0.gen)
    }
    df.write.mode(SaveMode.ErrorIfExists).format(head0.format).save(dataDir.toString)
    val filesInfo = listRelInfo(f, root, dataDir)
    val files = filesInfo.map(_._1)
    val cName = statsCol.orElse(head0.meta.get("stats.col")).filter(_.nonEmpty)
    val tCols = effectiveStatsCols(statsCols, head0.meta)
    val (stats, colStats) =
      collectFileStats(spark, root, dataDir, head0.format, cName, tCols)
    val statsMeta = cName.map(c => Map("stats.col" -> c)).getOrElse(Map.empty) ++
      (if (tCols.nonEmpty) Map("stats.cols" -> tCols.mkString(",")) else Map.empty)
    var attempt = 0
    while (attempt <= maxRetries) {
      val head = latest(spark, zone).getOrElse(head0)
      expectedBase.filter(_ != head.gen).foreach { eg =>
        // read-snapshot validation: the head moved past the generation
        // this replacement was computed from — clean up and abort (the
        // staged dir was never referenced by any manifest, so the delete
        // can strand no reader)
        f.delete(dataDir, true)
        throw new SnapshotMovedException(zone, eg, head.gen)
      }
      // replace RESETS the tracked schema: every live file is new, so the
      // zone's schema IS the replacement frame's (the retype path the
      // append-side merge guard points at). The column mapping resets
      // with it — the rewrite wrote logical names everywhere.
      val m = (head.meta -- ColMapMetaKeys) ++ statsMeta ++
        Map("schema" -> df.schema.json) ++ meta ++ Map("op" -> "replace")
      publish(spark, zone, head.gen + 1, head.format, files, m, stats,
        colStats, base = Some(head), sizes = filesInfo.toMap) match {
        case Some(g) =>
          return Snapshot(g, head.format, files, m, stats, colStats,
            base = head.gen, sizes = filesInfo.toMap)
        case None => ()
      }
      attempt += 1
      Thread.sleep(math.min(200L, 10L * attempt))
    }
    f.delete(dataDir, true)
    sys.error(s"txlog replace of $zone lost the publish race $maxRetries times")
  }

  /** Compare-and-swap replace: read the head, compute the replacement
    * FROM that snapshot, publish only if the head has not moved; on a
    * conflict re-read, recompute, retry — the packaged retry hook for
    * read-modify-write transforms (dedupe-in-place, retention deletes,
    * GDPR scrubs) where last-writer-wins would silently drop a rival's
    * commit. `compute` receives the head snapshot each attempt (None on
    * a virgin zone) and must derive its output from THAT read — that is
    * the invariant the validation protects. */
  def replaceCas(spark: SparkSession, zone: String,
                 compute: Option[Snapshot] => DataFrame,
                 maxAttempts: Int = 5,
                 meta: Map[String, String] = Map.empty,
                 statsCol: Option[String] = None,
                 statsCols: Seq[String] = Nil): Snapshot = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    var lastMove: SnapshotMovedException = null
    while (attempt < maxAttempts) {
      val head = latest(spark, zone)
      val base = head.map(_.gen).getOrElse {
        init(spark, zone).gen // virgin zone: pin the freshly-created gen 0
      }
      try {
        return replace(spark, zone, compute(head), meta = meta,
          statsCol = statsCol, statsCols = statsCols,
          expectedBase = Some(base))
      } catch {
        case e: SnapshotMovedException => lastMove = e
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"txlog replaceCas of $zone conflicted $maxAttempts times", lastMove)
  }

  /** `inserted`/`updated` are row counts; `filesTouched` of `filesTotal`
    * is how many live files the key-range stats made the merge rewrite —
    * the number the whole design exists to keep small. */
  final case class MergeStats(gen: Long, filesTouched: Long, filesTotal: Long,
                              updatedRows: Long, insertedRows: Long)

  /** Conform `df` to `schema` column-for-column: present columns pass
    * through (types already match — [[mergeSchemas]] rejects retypes),
    * absent ones surface as typed nulls. The projection that lets a
    * merge union survivors (old schema) with updates (possibly wider). */
  private def conform(df: DataFrame,
                      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val have = df.columns.toSet
    df.select(schema.fields.toSeq.map { fd =>
      if (have(fd.name)) col(fd.name).cast(fd.dataType).as(fd.name)
      else lit(null).cast(fd.dataType).as(fd.name)
    }: _*)
  }

  /** Keyed MERGE (upsert): rows of `updates` replace zone rows with the
    * same `key` value; keys the zone lacks are inserted — upsert-BY-KEY
    * semantics built on this log's primitives: a target zone holding
    * multiple rows for one key has ALL of them collapsed to the single
    * update row for that key (Delta's `WHEN MATCHED UPDATE SET *` is
    * cardinality-preserving instead; this merge treats `key` as the
    * primary key it prunes on). `updates` must be unique per key (the
    * standard multiple-match ambiguity is rejected, like Delta's).
    *
    * The 100 TB shape is the point: only files whose committed [min, max]
    * for `key` OVERLAPS the updates' key range are read and rewritten
    * (the [[prunedFilesFor]] skip used in reverse — as a WRITE
    * amplification bound); every other live file is carried into the new
    * generation untouched, stats and all. A CDC upsert batch touching one
    * day of a year-partitioned corpus rewrites that day, not the year.
    * Zones without tracked stats for `key` fall back to rewriting every
    * file (correct, just unpruned) — write with `statsCols` to get the
    * bound.
    *
    * Concurrency is OPTIMISTIC like [[replaceCas]]: the survivors are
    * computed FROM the head snapshot, so a rival commit landing first
    * aborts the publish, deletes the staged files, and the whole
    * read-merge-write recomputes against the new head — last-writer-wins
    * here would resurrect deleted rows or drop the rival's. Schema
    * evolves by the append rules ([[mergeSchemas]]): updates may add
    * columns, never retype.
    *
    * Reference anchor: the reference lake only ever APPENDS CDC deltas
    * (`lib/dynamodb-streaming-datalake-stack.ts:199-203`) and rebuilds
    * current state by full-scan compaction jobs; merge is the
    * incremental form of that snapshot (`Cdc.snapshot`'s LWW winner,
    * maintained in place). */
  def merge(spark: SparkSession, zone: String, updates: DataFrame, key: String,
            maxAttempts: Int = 5,
            prePublishHook: () => Unit = () => ()): MergeStats =
    mergeImpl(spark, zone, updates, key, maxAttempts, prePublishHook,
      batchId = None)
      .getOrElse(sys.error("unreachable: merge without a batchId never skips"))

  /** [[mergeImpl]] with `opCol`: change rows marked `"D"` in that column
    * are TOMBSTONES — their keys' target rows are removed and nothing is
    * re-inserted; every other row upserts as in [[merge]]. The op column
    * never lands in the zone. Same pruned-rewrite bound (files whose
    * `key` stats overlap the batch's key range), same OCC loop. */
  private def mergeImpl(spark: SparkSession, zone: String, updates: DataFrame,
                        key: String, maxAttempts: Int,
                        prePublishHook: () => Unit,
                        batchId: Option[Long],
                        opCol: Option[String] = None): Option[MergeStats] = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max, min}
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val f = fs(spark, zone)
    val root = f.makeQualified(new Path(zone))
    // bounded driver state: two key bounds + three row counts
    val updRows = updates.persist()
    try {
      val kr = updRows
        .agg(min(col(key)), max(col(key)), count(lit(1)), countDistinct(col(key)))
        .first()
      if (kr.isNullAt(0))
        return Some(MergeStats(latest(spark, zone).map(_.gen).getOrElse(0L),
          0L, latest(spark, zone).map(_.files.size.toLong).getOrElse(0L), 0L, 0L))
      require(kr.getLong(2) == kr.getLong(3),
        s"merge updates must be unique per '$key': ${kr.getLong(2)} rows over " +
          s"${kr.getLong(3)} distinct keys (resolve duplicates first — e.g. " +
          "Cdc.snapshot's last-writer-wins)")
      val (lo, hi) = (kr.get(0), kr.get(1))
      // the re-insert side: tombstone rows remove their key and nothing
      // else; the op marker itself never lands in the zone
      val dataRows = opCol.map(c =>
        updRows.filter(col(c) =!= "D").drop(c)).getOrElse(updRows)
      val upsertCount =
        if (opCol.isEmpty) kr.getLong(2) else dataRows.count()
      var attempt = 0
      while (attempt < maxAttempts) {
        val head = latest(spark, zone).getOrElse(init(spark, zone))
        // exactly-once re-check against the CURRENT head each attempt —
        // the same check-then-act closure appendImpl uses: a rival
        // replaying this batch that won an earlier race committed the
        // mark, so this attempt must become a no-op, not a double-merge
        if (batchId.exists(b =>
          head.meta.get("batchId").exists(_.toLong >= b))) return None
        val tracked = head.meta.getOrElse("stats.cols", "").split(",").contains(key)
        val touched =
          if (tracked) prunedFilesFor(head, key, lo, hi) else head.files
        val untouchedSet = head.files.toSet -- touched
        val schema = {
          val base = zoneSchema(head).orElse(
            if (head.files.nonEmpty) Some(readSnapshot(spark, zone, head).schema)
            else None)
          base.fold(dataRows.schema)(mergeSchemas(_, dataRows.schema))
        }
        val updKeys = updRows.select(col(key)).distinct()
        val touchedDf =
          if (touched.isEmpty)
            conform(dataRows, schema).filter(lit(false))
          else loadFiles(spark, head, touched.map(p => zone.stripSuffix("/") + "/" + p))
        val survivors = touchedDf.join(updKeys, Seq(key), "left_anti")
        // count distinct MATCHED KEYS, not matched target rows: a zone
        // holding duplicate rows for one key would overcount updates and
        // push insertedRows negative. (Those duplicate target rows are
        // collapsed to the single update row for their key — upsert-by-key
        // semantics; updates are unique per key by the require above, so
        // updatedRows <= total update rows and insertedRows >= 0.)
        val updatedRows =
          updKeys.join(touchedDf.select(col(key)), Seq(key), "left_semi").count()
        val insertedRows = math.max(0L, upsertCount - updatedRows)
        val dataDir = new Path(root, "d-" + UUID.randomUUID().toString.take(8))
        // insert-only fast path: no touched files -> no survivors side, so
        // don't union an empty frame in (its empty write partitions would
        // become zero-row data files)
        val newData =
          if (touched.isEmpty) conform(dataRows, schema)
          else conform(survivors, schema).unionByName(conform(dataRows, schema))
        toPhysical(newData, colMap(head.meta)).write
          .mode(SaveMode.ErrorIfExists).format(head.format)
          .save(dataDir.toString)
        val newInfo = listRelInfo(f, root, dataDir)
        val newFiles = newInfo.map(_._1)
        val (newStats, newColStats) = collectFileStats(spark, root, dataDir,
          head.format, head.meta.get("stats.col").filter(_.nonEmpty),
          effectiveStatsCols(Nil, head.meta), colMap(head.meta))
        val nextFiles = (head.files.filter(untouchedSet) ++ newFiles).sorted
        // untouched files keep their committed stats; touched files' entries drop
        val nextStats = head.stats.filter { case (p, _) => untouchedSet(p) } ++ newStats
        val nextColStats =
          head.colStats.filter { case (p, _) => untouchedSet(p) } ++ newColStats
        val nextSizes =
          head.sizes.filter { case (p, _) => untouchedSet(p) } ++ newInfo.toMap
        prePublishHook()
        val batchMeta =
          batchId.map(b => Map("batchId" -> b.toString)).getOrElse(Map.empty)
        publish(spark, zone, head.gen + 1, head.format, nextFiles,
          head.meta ++ Map("schema" -> schema.json) ++ batchMeta ++
            Map("op" -> "merge"),
          nextStats, nextColStats, base = Some(head),
          sizes = nextSizes) match {
          case Some(g) =>
            return Some(MergeStats(g, touched.size.toLong, head.files.size.toLong,
              updatedRows, insertedRows))
          case None =>
            // rival landed: the survivors were computed from a stale head —
            // discard the staged rewrite and recompute from the new one
            f.delete(dataDir, true)
        }
        attempt += 1
        Thread.sleep(math.min(200L, 10L * attempt))
      }
      sys.error(s"txlog merge into $zone conflicted $maxAttempts times")
    } finally updRows.unpersist()
  }

  /** Exactly-once streaming MERGE: the upsert twin of
    * [[exactlyOnceAppend]] — skip batches at or below the committed
    * high-water mark, and stamp the mark IN the merge's own publish so
    * data + mark flip atomically. `foreachBatch(TxLog.mergeSink(zone,
    * key))` turns a CDC stream into an incrementally-maintained current-
    * state table: the reference's append-then-recompact lake
    * (`firehose_transformation.py` + batch snapshot jobs) collapsed into
    * one idempotent sink. Returns true when the batch merged. */
  def mergeExactlyOnce(spark: SparkSession, zone: String, updates: DataFrame,
                       key: String, batchId: Long): Boolean = {
    // fast path: skip before any compute; the authoritative check re-runs
    // against the head inside mergeImpl's publish loop, so two writers
    // replaying the same batchId cannot both commit (the mark rides in
    // the merge's OWN publish — data + mark flip in one atomic commit)
    val committed = latest(spark, zone).flatMap(_.meta.get("batchId")).map(_.toLong)
    if (committed.exists(_ >= batchId)) false
    else mergeImpl(spark, zone, updates, key, maxAttempts = 5,
      prePublishHook = () => (), batchId = Some(batchId)).isDefined
  }

  /** `writeStream.foreachBatch(TxLog.mergeSink(zone, key))` — the
    * exactly-once keyed-upsert lake sink. The batch must be unique per
    * key (use [[cdcMergeSink]] for raw CDC batches). */
  def mergeSink(zone: String, key: String): (DataFrame, Long) => Unit =
    (df, batchId) => {
      mergeExactlyOnce(df.sparkSession, zone, df, key, batchId): Unit
    }

  /** The CDC current-state sink: each micro-batch is first reduced to its
    * per-key LAST-WRITER-WINS row (greatest `ordCol`, remaining columns
    * as a deterministic tiebreak — one hash agg over a max-struct, the
    * same no-window winner shape as `Cdc.snapshot`), then upserted
    * exactly-once. This maintains the compacted current-state table
    * INCREMENTALLY — the reference computes it by full-scan snapshot
    * jobs over the appended delta lake (`Cdc.snapshot` replaying
    * `firehose_transformation.py` output); at 100 TB the full rebuild
    * reads everything ever written, this reads the files one batch's
    * keys touch.
    *
    * Ordering contract: batches are assumed key-ordered ACROSS batches —
    * exactly the reference transport's guarantee (Kinesis per-shard
    * ordering: one key rides one shard, `lib/dynamodb-streaming-
    * datalake-stack.ts:59-64`), so a later batch's row for a key
    * supersedes the stored one unconditionally. A transport without that
    * guarantee needs a compare-on-`ordCol` merge variant instead. */
  def cdcMergeSink(zone: String, key: String,
                   ordCol: String): (DataFrame, Long) => Unit =
    (df, batchId) => {
      import org.apache.spark.sql.functions.{col, max, struct}
      val others = df.columns.filterNot(c => c == key || c == ordCol).toSeq
      val packed = df.groupBy(col(key))
        .agg(max(struct((ordCol +: others).map(col): _*)).as("__w"))
      val lww = packed
        .select(col(key) +: (ordCol +: others).map(c => col("__w." + c).as(c)): _*)
        .select(df.columns.toSeq.map(col): _*)
      mergeExactlyOnce(df.sparkSession, zone, lww, key, batchId): Unit
    }

  /** Exactly-once keyed CHANGES: [[mergeExactlyOnce]] extended with
    * tombstones — rows whose `opCol` value is `"D"` DELETE their key
    * from the zone (nothing re-inserted), every other row upserts. The
    * primitive a CDC feed with REMOVE events needs to maintain a
    * current-state corpus: membership retracts, not just replaces. The
    * op column never lands in the zone; changes must be unique per key
    * (reduce to the per-key last-writer first — [[cdcChangesSink]]). */
  def changesExactlyOnce(spark: SparkSession, zone: String, changes: DataFrame,
                         key: String, opCol: String, batchId: Long): Boolean = {
    val committed = latest(spark, zone).flatMap(_.meta.get("batchId")).map(_.toLong)
    if (committed.exists(_ >= batchId)) false
    else mergeImpl(spark, zone, changes, key, maxAttempts = 5,
      prePublishHook = () => (), batchId = Some(batchId),
      opCol = Some(opCol)).isDefined
  }

  /** The keyed-CDC current-state sink WITH tombstones: each micro-batch
    * reduces to its per-key last-writer-wins CHANGE (greatest `ordCol`;
    * the op rides the winner struct, so a key whose final event in the
    * batch is a delete tombstones even if earlier events upserted), then
    * applies exactly-once via [[changesExactlyOnce]]. This is
    * [[cdcMergeSink]] for feeds where REMOVE means "leave the table",
    * not "merge a null image" — the streaming lake's corpus-membership
    * sink (round-15 directive #4). Same cross-batch ordering contract
    * as [[cdcMergeSink]] (per-key order across batches — the reference
    * transport's per-shard guarantee). */
  def cdcChangesSink(zone: String, key: String, ordCol: String,
                     opCol: String): (DataFrame, Long) => Unit =
    (df, batchId) => {
      import org.apache.spark.sql.functions.{col, max, struct}
      val others = df.columns.filterNot(c => c == key || c == ordCol).toSeq
      val packed = df.groupBy(col(key))
        .agg(max(struct((ordCol +: others).map(col): _*)).as("__w"))
      val lww = packed
        .select(col(key) +: (ordCol +: others).map(c => col("__w." + c).as(c)): _*)
        .select(df.columns.toSeq.map(col): _*)
      changesExactlyOnce(df.sparkSession, zone, lww, key, opCol, batchId): Unit
    }

  /** `deletedRows` is exact; `filesTouched` of `filesTotal` is how many
    * live files the range stats made the delete rewrite. */
  final case class DeleteStats(gen: Long, filesTouched: Long, filesTotal: Long,
                               deletedRows: Long)

  /** Targeted DELETE: remove every row where `column` ∈ [lo, hi],
    * rewriting ONLY the files whose committed stats overlap the range —
    * the retention/GDPR-scrub primitive [[replaceCas]]'s scaladoc points
    * at, with the same write-amplification bound as [[merge]]: a scrub
    * of one user's key touches that key's files, never the zone. A file
    * whose stats sit ENTIRELY inside [lo, hi] could in principle be
    * dropped without reading; it is rewritten anyway so `deletedRows` is
    * exact and stat-less edge files stay correct — the dominant cost is
    * unchanged (files the range misses are never read). Optimistic
    * concurrency like merge: a rival commit mid-delete aborts the
    * publish and the delete recomputes from the new head. Zones without
    * stats for `column` rewrite every file (correct, unpruned). */
  def deleteWhereCol(spark: SparkSession, zone: String, column: String,
                     lo: Any, hi: Any, maxAttempts: Int = 5,
                     prePublishHook: () => Unit = () => ()): DeleteStats =
    deleteWhereFiles(spark, zone,
      head => {
        val tracked =
          head.meta.getOrElse("stats.cols", "").split(",").contains(column)
        if (tracked) prunedFilesFor(head, column, lo, hi) else head.files
      },
      df => nativeRangePred(df, column, lo, hi),
      maxAttempts, prePublishHook)

  /** General OCC rewrite DELETE — [[deleteWhereCol]] with the two
    * predicate-shaped decisions injected, so ANY predicate source (the
    * range form above; SQL `DELETE FROM` on the DSv2 table, whose WHERE
    * clause arrives as translated v1 filters) reuses one rewrite loop:
    *
    *  - `touchedFor(head)` names the files the predicate might live in —
    *    a SUPERSET contract (a file omitted here keeps ALL its rows, so
    *    an under-approximation would silently not-delete); callers prune
    *    with committed stats when they can, `head.files` when they
    *    can't.
    *  - `pred(touchedDf)` is the EXACT delete predicate over the loaded
    *    touched files; survivors are its complement. Null-safe by
    *    Column semantics: a NULL predicate row survives (SQL DELETE
    *    deletes only rows where the condition is TRUE).
    *
    * Each attempt re-reads the head (rivals may have landed), rewrites
    * survivors into a fresh data dir, and publishes op=delete with the
    * untouched files carried over — write amplification stays
    * O(touched), the merge/scrub bound. */
  def deleteWhereFiles(spark: SparkSession, zone: String,
                       touchedFor: Snapshot => Seq[String],
                       pred: DataFrame => org.apache.spark.sql.Column,
                       maxAttempts: Int = 5,
                       prePublishHook: () => Unit = () => ()): DeleteStats = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val f = fs(spark, zone)
    val root = f.makeQualified(new Path(zone))
    var attempt = 0
    while (attempt < maxAttempts) {
      val head = latest(spark, zone).getOrElse(init(spark, zone))
      val touched = touchedFor(head)
      val untouchedSet = head.files.toSet -- touched
      if (touched.isEmpty)
        return DeleteStats(head.gen, 0L, head.files.size.toLong, 0L)
      val touchedDf =
        loadFiles(spark, head, touched.map(p => zone.stripSuffix("/") + "/" + p))
      // SQL DELETE removes only rows where the condition is TRUE: a
      // NULL-valued predicate row must SURVIVE. A bare !pred would be
      // NULL for those rows and filter them out of the survivors —
      // silently deleting them — so the predicate is coalesced to
      // false before negation.
      val survivors = touchedDf.filter(
        !org.apache.spark.sql.functions.coalesce(pred(touchedDf),
          org.apache.spark.sql.functions.lit(false)))
      val deleted = touchedDf.count() - survivors.count()
      val dataDir = new Path(root, "d-" + UUID.randomUUID().toString.take(8))
      toPhysical(survivors, colMap(head.meta)).write
        .mode(SaveMode.ErrorIfExists).format(head.format)
        .save(dataDir.toString)
      val newInfo = listRelInfo(f, root, dataDir)
      val newFiles = newInfo.map(_._1)
      val (newStats, newColStats) = collectFileStats(spark, root, dataDir,
        head.format, head.meta.get("stats.col").filter(_.nonEmpty),
        effectiveStatsCols(Nil, head.meta), colMap(head.meta))
      val nextFiles = (head.files.filter(untouchedSet) ++ newFiles).sorted
      val nextStats = head.stats.filter { case (p, _) => untouchedSet(p) } ++ newStats
      val nextColStats =
        head.colStats.filter { case (p, _) => untouchedSet(p) } ++ newColStats
      val nextSizes =
        head.sizes.filter { case (p, _) => untouchedSet(p) } ++ newInfo.toMap
      prePublishHook()
      publish(spark, zone, head.gen + 1, head.format, nextFiles,
        head.meta ++ Map("op" -> "delete"),
        nextStats, nextColStats, base = Some(head), sizes = nextSizes) match {
        case Some(g) =>
          return DeleteStats(g, touched.size.toLong, head.files.size.toLong, deleted)
        case None =>
          f.delete(dataDir, true)
      }
      attempt += 1
      Thread.sleep(math.min(200L, 10L * attempt))
    }
    sys.error(s"txlog delete from $zone conflicted $maxAttempts times")
  }

  /** Exact row count from manifest stats alone — ZERO data files read:
    * the aggregate-pushdown answer Delta/Iceberg serve from file-level
    * metadata, and at 100 TB the difference between a catalog lookup and
    * a full scan. Every [[ColStat]] carries the file's row count (all
    * columns of a file agree), so any tracked column serves. None when
    * some live file predates stats tracking — the caller falls back to a
    * scan rather than trusting a partial count. */
  def metadataCount(spark: SparkSession, zone: String): Option[Long] = {
    val head = latest(spark, zone).getOrElse(return None)
    if (head.files.isEmpty) return Some(0L)
    val perFile = head.files.map(f =>
      head.colStats.get(f).flatMap(_.values.headOption).map(_.rows))
    if (perFile.forall(_.isDefined)) Some(perFile.flatten.sum) else None
  }

  /** The complete snapshot of generation `gen`, if its manifest still
    * exists (i.e. within [[vacuum]] retention) — explicit time travel by
    * generation number, beyond the pinned-snapshot form [[readSnapshot]]
    * already serves. */
  def snapshotAt(spark: SparkSession, zone: String, gen: Long): Option[Snapshot] =
    resolveSnapshot(fs(spark, zone), zone, gen)

  /** The newest snapshot whose commit LANDED at or before `tsMillis`,
    * by manifest-file modification time — the same commit clock the
    * torn-manifest grace window and vacuum already trust, and the same
    * rule Delta's timestamp time travel uses (the filesystem stamps the
    * commit; no clock rides in the manifest body). Candidate
    * generations are tried newest-first so a torn corpse at the cutoff
    * falls through to the newest RESOLVABLE commit. None when no commit
    * existed that early (callers distinguish "zone too young" from
    * "zone has no log"). Within-retention only, like [[snapshotAt]]:
    * a vacuumed generation's files are gone regardless of what the log
    * remembers. */
  def snapshotAsOf(spark: SparkSession, zone: String,
                   tsMillis: Long): Option[Snapshot] = {
    val f = fs(spark, zone)
    val dir = logDirPath(zone)
    if (!f.exists(dir)) return None
    val gens = f.listStatus(dir).toSeq
      .filter(st => st.getPath.getName.startsWith("gen-") &&
        st.getModificationTime <= tsMillis)
      .flatMap(st => pathGen(st.getPath))
      .sorted(Ordering[Long].reverse)
    gens.iterator.flatMap(g => snapshotAt(spark, zone, g)).nextOption()
  }

  /** Commit history within retention — Delta's DESCRIBE HISTORY: one row
    * per surviving commit, newest first, with the operation that
    * produced it (every write path stamps `op` into its commit meta),
    * the commit kind (full manifest vs delta actions), and the action
    * counts. Reads ONLY commit files (bounded by vacuum's log GC), never
    * data; the audit surface an operator checks before a RESTORE. */
  def history(spark: SparkSession, zone: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, zone)
    val dir = logDirPath(zone)
    val rows: Seq[(Long, Long, String, String, Long, Long, Option[Long],
        java.sql.Timestamp)] =
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).toSeq
        .filter(_.getPath.getName.startsWith("gen-"))
        .flatMap(st => readCommit(f, st.getPath)
          .map(c => (c, st.getModificationTime)))
        .sortBy(-_._1.gen)
        .map { case (c, mt) =>
          // commit_ts is the manifest's mtime — the clock snapshotAsOf's
          // timestamp travel resolves against, so a history row's time
          // is exactly what .option("asOfTimestamp", ...) accepts
          val ts = new java.sql.Timestamp(mt)
          c match {
            case FullCommit(s) =>
              (s.gen, s.baseGen, "full",
                s.meta.getOrElse("op", ""), s.files.size.toLong, 0L,
                s.meta.get("batchId").map(_.toLong), ts)
            case d: DeltaCommit =>
              (d.gen, d.base, "delta",
                d.meta.getOrElse("op", ""), d.adds.size.toLong,
                d.removes.size.toLong, d.meta.get("batchId").map(_.toLong), ts)
          }
        }
    rows.toDF("gen", "base", "kind", "op", "num_added", "num_removed",
      "batch_id", "commit_ts")
  }

  /** RESTORE the zone to a past generation's content, committed as a NEW
    * generation — Delta's RESTORE: a manifest-level rollback referencing
    * the old generation's (immutable) files, no data copied or rewritten.
    * History stays intact (the rolled-back generations remain readable
    * until vacuum), and because the restored files are referenced by the
    * new head again, retention keeps them alive going forward. Fails if
    * `gen`'s manifest is already vacuumed. A lost publish race rebases
    * and retries — restore names a FIXED generation's content, so unlike
    * merge/delete there is nothing stale to recompute (rivals committed
    * after the race simply lose that race's rows to the rollback, which
    * is restore's stated meaning). */
  def restore(spark: SparkSession, zone: String, gen: Long,
              maxRetries: Int = 5): Snapshot = {
    val target = snapshotAt(spark, zone, gen).getOrElse(
      sys.error(s"$zone generation $gen is gone (vacuumed?) — cannot restore"))
    var attempt = 0
    while (attempt <= maxRetries) {
      val head = latest(spark, zone).getOrElse(init(spark, zone))
      if (head.gen == gen) return head // restoring to the head is a no-op
      // carry the head's operational meta (e.g. the streaming batchId
      // high-water mark) but the TARGET's schema, stats, and COLUMN
      // MAPPING (the restored files' physical layout is the target's —
      // the head's mapping may describe files this commit abandons)
      val meta = (head.meta -- ColMapMetaKeys) ++
        target.meta.get("schema").map("schema" -> _).toMap ++
        target.meta.view.filterKeys(ColMapMetaKeys.contains).toMap ++
        Map("op" -> "restore")
      publish(spark, zone, head.gen + 1, target.format, target.files,
        meta, target.stats, target.colStats, base = Some(head),
        sizes = target.sizes) match {
        case Some(g) =>
          return Snapshot(g, target.format, target.files, meta,
            target.stats, target.colStats, base = head.gen,
            sizes = target.sizes)
        case None => ()
      }
      attempt += 1
      Thread.sleep(math.min(200L, 10L * attempt))
    }
    sys.error(s"txlog restore of $zone lost the publish race $maxRetries times")
  }

  /** Change feed for APPEND-ONLY zones: the rows committed after
    * `fromGen`, up to and including `toGen` (default: the head) — read
    * by FILE DIFF, so an incremental consumer (a maintained aggregate, a
    * downstream sync) pays for the delta, never the zone. This is sound
    * only while every intervening commit strictly ADDED files; a
    * replace/compact/merge/delete in the window rewrites history and the
    * diff would double- or under-count — detected (the old generation
    * holds a file the new one dropped) and rejected loudly. Both
    * manifests must still be within vacuum retention. */
  def appendedBetween(spark: SparkSession, zone: String, fromGen: Long,
                      toGen: Long = Long.MaxValue): DataFrame = {
    val (to, added) = appendedFilesBetween(spark, zone, fromGen, toGen)
    if (added.isEmpty)
      readSnapshot(spark, zone, to).filter(org.apache.spark.sql.functions.lit(false))
    else loadFiles(spark, to, added.map(p => zone.stripSuffix("/") + "/" + p))
  }

  /** File-level form of [[appendedBetween]]: the `to` snapshot plus the
    * RELATIVE paths of the files generations (fromGen, toGen] added —
    * same resolution and same loud append-only contract. The streaming
    * source consumes this form so its scan can prune the added-file list
    * against the snapshot's committed column stats before opening
    * anything. */
  def appendedFilesBetween(spark: SparkSession, zone: String, fromGen: Long,
                           toGen: Long = Long.MaxValue): (Snapshot, Seq[String]) = {
    val head = latest(spark, zone).getOrElse(
      sys.error(s"$zone has no transaction log"))
    val to =
      if (toGen == Long.MaxValue || toGen == head.gen) head
      else snapshotAt(spark, zone, toGen).getOrElse(
        sys.error(s"$zone generation $toGen is gone (vacuumed?) — cannot diff"))
    val from = snapshotAt(spark, zone, fromGen).getOrElse(
      sys.error(s"$zone generation $fromGen is gone (vacuumed?) — cannot diff"))
    val toSet = to.files.toSet
    val dropped = from.files.filterNot(toSet)
    require(dropped.isEmpty,
      s"$zone is not append-only between gen $fromGen and gen ${to.gen}: " +
        s"${dropped.size} file(s) were rewritten (compact/replace/merge/delete) — " +
        "an incremental file-diff read would be wrong; re-read the full snapshot")
    val fromSet = from.files.toSet
    (to, to.files.filterNot(fromSet))
  }

  /** Exactly-once micro-batch append for Structured Streaming: commit
    * `df` tagged with `batchId`, skipping batches at or below the zone's
    * committed high-water mark — a replayed batch (restart re-running the
    * last uncommitted-to-the-SINK trigger) becomes a no-op instead of a
    * duplicate. The mark rides IN the manifest, so data + mark commit in
    * the same atomic publish (the standard idempotent-foreachBatch
    * contract; one streaming query per zone — concurrent writers of the
    * SAME batchId are outside Structured Streaming's model). Returns true
    * when the batch was appended, false when skipped as already
    * committed. */
  def exactlyOnceAppend(spark: SparkSession, zone: String, df: DataFrame,
                        batchId: Long, statsCols: Seq[String] = Nil): Boolean = {
    // fast path: skip before staging any data files; the authoritative
    // check is re-run against the head inside appendImpl's publish loop,
    // so two writers replaying the same batchId cannot both commit
    val committed = latest(spark, zone).flatMap(_.meta.get("batchId")).map(_.toLong)
    if (committed.exists(_ >= batchId)) false
    else appendImpl(spark, zone, df, maxRetries = 5,
      meta = Map("batchId" -> batchId.toString), statsCol = None,
      statsCols = statsCols, batchId = Some(batchId)).isDefined
  }

  /** `writeStream.foreachBatch(TxLog.streamSink(zone))` — the
    * exactly-once lake sink. */
  def streamSink(zone: String): (DataFrame, Long) => Unit = (df, batchId) => {
    exactlyOnceAppend(df.sparkSession, zone, df, batchId): Unit
  }

  /** Compact the newest snapshot into ~targetBytes files, published as a
    * new generation. Readers of the old snapshot are untouched — their
    * files stay on disk until [[vacuum]] retention passes them. A lost
    * publish race (concurrent append/compact) ABORTS and removes the
    * rewrite: recompacting a stale base could drop the winner's rows.
    * `prePublishHook` is a test seam between data write and publish. */
  def compact(spark: SparkSession, zone: String, targetBytes: Long = 128L << 20,
              prePublishHook: () => Unit = () => ()): CompactStats = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val f = fs(spark, zone)
    val root = f.makeQualified(new Path(zone))
    val head = latest(spark, zone).getOrElse(init(spark, zone))
    val bytes = committedBytes(f, zone, head)
    val wantFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
    if (head.files.size <= wantFiles)
      return CompactStats(head.gen, head.files.size.toLong, head.files.size.toLong,
        bytes, rewritten = false)
    val dataDir = new Path(root, "d-" + UUID.randomUUID().toString.take(8))
    readSnapshot(spark, zone, head).repartition(wantFiles.toInt)
      .write.mode(SaveMode.ErrorIfExists).format(head.format).save(dataDir.toString)
    val newInfo = listRelInfo(f, root, dataDir)
    val newFiles = newInfo.map(_._1)
    // a stats-tracked zone recomputes per-file stats for the rewrite
    val (newStats, newColStats) = collectFileStats(spark, root, dataDir,
      head.format, head.meta.get("stats.col").filter(_.nonEmpty), effectiveStatsCols(Nil, head.meta))
    prePublishHook()
    // meta carries forward: compaction must not erase e.g. the streaming
    // sink's batchId high-water mark. The column mapping RESETS: the
    // rewrite read logically and wrote every live file under logical
    // names — maintenance normalizes the physical layout for free.
    publish(spark, zone, head.gen + 1, head.format, newFiles,
      (head.meta -- ColMapMetaKeys) ++ Map("op" -> "compact"),
      newStats, newColStats, base = Some(head), sizes = newInfo.toMap) match {
      case Some(g) =>
        CompactStats(g, head.files.size.toLong, newFiles.size.toLong,
          bytes, rewritten = true)
      case None =>
        f.delete(dataDir, true)
        CompactStats(head.gen, head.files.size.toLong, head.files.size.toLong,
          bytes, rewritten = false)
    }
  }

  /** Compact AND re-cluster in one rewrite — Delta's `OPTIMIZE ... ZORDER
    * BY`: the zone's live rows are Z-ordered on `cols`
    * ([[Layout.clusterByZ]]) into ~`targetBytes` files and published as
    * a new generation with fresh per-file stats. Appends scatter a key
    * space across files over time (every file's min/max widens until
    * range pruning degenerates to a full scan — exactly at the scale it
    * matters); this maintenance pass restores TIGHT per-file bounds on
    * every clustered column at once, so [[readWhereCols]]' stats
    * intersection prunes sharply again. `bits` is the per-column budget
    * of the interleaved z-value; columns must be numeric and
    * non-negative after the caller's own bucketing (the [[Layout]]
    * contract). Unlike [[compact]] this always rewrites (re-clustering
    * is the point, not file-count reduction); the same lost-race abort
    * applies. */
  def compactClustered(spark: SparkSession, zone: String, cols: Seq[String],
                       bits: Int = 10, targetBytes: Long = 128L << 20): CompactStats = {
    require(cols.nonEmpty, "compactClustered needs at least one cluster column")
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val f = fs(spark, zone)
    val root = f.makeQualified(new Path(zone))
    val head = latest(spark, zone).getOrElse(init(spark, zone))
    if (head.files.isEmpty)
      return CompactStats(head.gen, 0L, 0L, 0L, rewritten = false)
    val bytes = committedBytes(f, zone, head)
    val wantFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong).toInt
    val dataDir = new Path(root, "d-" + UUID.randomUUID().toString.take(8))
    Layout.clusterByZ(readSnapshot(spark, zone, head), cols, bits, wantFiles)
      .write.mode(SaveMode.ErrorIfExists).format(head.format).save(dataDir.toString)
    val newInfo = listRelInfo(f, root, dataDir)
    val newFiles = newInfo.map(_._1)
    val statsCols = (effectiveStatsCols(Nil, head.meta) ++ cols).distinct
    val (newStats, newColStats) = collectFileStats(spark, root, dataDir,
      head.format, head.meta.get("stats.col").filter(_.nonEmpty), statsCols)
    // mapping resets with the rewrite, like compact
    val meta = (head.meta -- ColMapMetaKeys) ++
      (if (statsCols.nonEmpty) Map("stats.cols" -> statsCols.mkString(",")) else Map.empty)
    publish(spark, zone, head.gen + 1, head.format, newFiles,
      meta ++ Map("op" -> "compactClustered"),
      newStats, newColStats, base = Some(head), sizes = newInfo.toMap) match {
      case Some(g) =>
        CompactStats(g, head.files.size.toLong, newFiles.size.toLong, bytes,
          rewritten = true)
      case None =>
        f.delete(dataDir, true)
        CompactStats(head.gen, head.files.size.toLong, head.files.size.toLong,
          bytes, rewritten = false)
    }
  }

  /** Delete data files referenced ONLY by generations older than the
    * newest `keepGens`, plus those generations' manifests. Never touches
    * the files of a kept snapshot, and never touches files younger than
    * `graceMs`: an in-flight append/compact/replace has written its
    * d-<uuid> files but not yet published, so an unreferenced-but-fresh
    * file is most likely a commit in progress, not garbage (the same
    * reasoning as Delta's retention window). Pick `graceMs` above the
    * longest plausible write-to-publish gap. */
  def vacuum(spark: SparkSession, zone: String, keepGens: Int = 2,
             graceMs: Long = 15L * 60L * 1000L): Long = {
    require(keepGens >= 1, s"keepGens must be >= 1, got $keepGens")
    require(graceMs >= 0, s"graceMs must be >= 0, got $graceMs")
    val f = fs(spark, zone)
    val root = f.makeQualified(new Path(zone))
    val dir = new Path(root, LogDir)
    if (!f.exists(dir)) return 0L
    val listing = f.listStatus(dir).toSeq
    val manifests = listing
      .filter(_.getPath.getName.startsWith("gen-")).sortBy(_.getPath.getName)
    val chks = listing
      .filter(_.getPath.getName.startsWith("chk-")).sortBy(_.getPath.getName)
    val cutoff = System.currentTimeMillis() - graceMs
    // torn manifests get the PUBLISH-side grace floor regardless of the
    // caller's graceMs: a torn-looking file younger than that window may
    // be a publish whose body is still streaming, and deleting its
    // manifest would lose an acknowledged commit
    val tornCutoff =
      System.currentTimeMillis() - math.max(graceMs, TornManifestGraceMs)
    // Retention counts COMPLETE manifests only: a crash-torn newest
    // manifest must not occupy a retention slot (with keepGens=1 it would
    // make `live` empty and vacuum would delete the newest real
    // generation's data). Torn manifests are not snapshots — they are
    // GC'd once past the torn grace floor (fresher ones may be a publish
    // in progress; the publish-side skip-forward handles the wedge case).
    val parsed = manifests.map(st => (st, readCommit(f, st.getPath)))
    val complete = parsed.collect { case (st, Some(c)) => (st, c) }
    val tornDrops = parsed.collect {
      case (st, None) if st.getModificationTime < tornCutoff => st.getPath
    }
    // with no complete manifest at all, liveness is unknowable — GC torn
    // manifests but leave every data file and checkpoint in place
    if (complete.isEmpty) {
      tornDrops.foreach(f.delete(_, false))
      return 0L
    }
    val keep = complete.takeRight(keepGens)
    val oldestKept = keep.head._2.gen
    // RESOLVE every kept generation up front: the live set and the GC
    // anchor both come from full reconstructions, and if any kept chain
    // is unreadable the only safe move is to delete nothing but torn
    // corpses (a partial live set would GC referenced data files).
    val keptSnaps = keep.map { case (_, c) => resolveSnapshot(f, zone, c.gen) }
    if (keptSnaps.exists(_.isEmpty)) {
      tornDrops.foreach(f.delete(_, false))
      return 0L
    }
    // LOG GC (the checkpoint-fold): make the oldest kept generation an
    // ANCHOR — if it is a delta commit without a checkpoint, write
    // chk-<oldestKept> from its resolved state NOW, before anything
    // below it is dropped — then every older delta commit, full
    // manifest, and checkpoint is fold-superseded and can go. This is
    // what bounds the log dir: a year of 60 s streaming commits stays
    // ≤ keepGens + interval manifests after each vacuum, and `latest`
    // stays O(pointer + tail) instead of O(history).
    val oldestSnap = keptSnaps.head.get
    val needAnchor = keep.head._2 match {
      case _: DeltaCommit => readCommit(f, chkPath(zone, oldestKept)).isEmpty
      case _ => false
    }
    if (needAnchor) writeCheckpoint(f, zone, oldestSnap)
    else writePointer(f, zone, oldestKept)
    // verify the anchor actually landed before dropping the chain below
    val anchored = keep.head._2.isInstanceOf[FullCommit] ||
      readCommit(f, chkPath(zone, oldestKept)).nonEmpty
    val dropManifests =
      if (anchored) complete.collect {
        case (st, c) if c.gen < oldestKept => st.getPath
      } ++ tornDrops
      else tornDrops
    // multi-part checkpoint shards (`chp-<gen>-<i>-of-<n>`) GC with
    // their generation, exactly like the base chk- file
    val chpGen: Path => Option[Long] = p => {
      val nm = p.getName
      if (!nm.startsWith("chp-")) None
      else scala.util.Try(nm.stripPrefix("chp-").take(20).toLong).toOption
    }
    val dropChks =
      if (anchored)
        chks.map(_.getPath).filter(p => pathGen(p).exists(_ < oldestKept)) ++
          listing.map(_.getPath).filter(p => chpGen(p).exists(_ < oldestKept))
      else Nil
    val live: Set[String] = keptSnaps.flatMap(_.get.files).toSet
    // only files under d-* write dirs are vacuum-managed; gen-0 root files
    // from init() predate the log and are left alone
    var removed = 0L
    f.listStatus(root).filter(s => s.isDirectory && s.getPath.getName.startsWith("d-"))
      .foreach { d =>
        val it = f.listFiles(d.getPath, true)
        val rootPath = root.toUri.getPath.stripSuffix("/")
        while (it.hasNext) {
          val st = it.next()
          val rel = st.getPath.toUri.getPath.stripPrefix(rootPath).stripPrefix("/")
          val name = st.getPath.getName
          if (!name.startsWith("_") && !name.startsWith(".") &&
              !live.contains(rel) && st.getModificationTime < cutoff) {
            if (f.delete(st.getPath, false)) removed += 1
          }
        }
        if (listRel(f, root, d.getPath).isEmpty) f.delete(d.getPath, true)
      }
    (dropManifests ++ dropChks).foreach(f.delete(_, false))
    removed
  }
}
