package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Local emulation of a Kinesis-shaped shard transport — the reference's
  * ingest stream (10 shards, `lib/dynamodb-streaming-datalake-stack.ts:
  * 59-64`) reduced to the four semantics the pipeline actually depends
  * on, each testable without a network:
  *
  *  - PARTITION-KEY ROUTING over a hash range: a record's MD5(key) picks
  *    the one OPEN shard whose [hashLo, hashHi) range covers it — one key
  *    always rides one shard (while the shard map is stable), which is
  *    what makes per-shard ordering a per-KEY ordering guarantee.
  *  - PER-SHARD SEQUENCE NUMBERS: dense, monotone, assigned at put; the
  *    only ordering the transport promises (A15 — there is NO cross-shard
  *    order, and consumers must not invent one).
  *  - RESHARDING: split halves an open shard's hash range into two child
  *    shards; merge joins two ADJACENT shards. Parents close (reject
  *    puts, keep serving reads) and children record their parentage —
  *    a consumer preserving per-key order reads a parent to its end
  *    before its children, which [[ShardStreamSource]] gets for free
  *    because a closed parent's records all precede every child record.
  *  - CHECKPOINTED CURSORS: readers track (shardId -> last consumed seq)
  *    and resume exactly; [[ShardStreamSource]] serializes that map as
  *    its streaming Offset.
  *
  * Storage is one directory: `shards.idx` (the shard map, rewritten via
  * temp+atomic-move) and one `r-<seq>` file per record under each
  * shard's subdirectory (create-exclusive — the same claim primitive as
  * TxLog's publish). Single-process test scale by design; a real Kinesis
  * client implements the same surface against the AWS API. */
final class ShardStore(val dir: String) {

  final case class Shard(id: String, open: Boolean, hashLo: Long, hashHi: Long,
                         parents: Seq[String])

  private def root: Path = Paths.get(dir)
  private def idxPath: Path = root.resolve("shards.idx")
  private def shardDir(id: String): Path = root.resolve(id)
  private def recPath(id: String, seq: Long): Path =
    shardDir(id).resolve(f"r-$seq%020d")

  /** MD5-based key hash into [0, Long.MaxValue) — stable across JVMs
    * (never String.hashCode), like Kinesis' 128-bit MD5 routing. */
  def keyHash(partitionKey: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(partitionKey.getBytes(UTF_8))
    val h = java.nio.ByteBuffer.wrap(d).getLong(0)
    h & Long.MaxValue
  }

  def createStream(nShards: Int): Unit = this.synchronized {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(!Files.exists(idxPath), s"shard store at $dir already exists")
    Files.createDirectories(root)
    val width = Long.MaxValue / nShards
    val shards = (0 until nShards).map { i =>
      val lo = i * width
      val hi = if (i == nShards - 1) Long.MaxValue else (i + 1) * width
      Shard(s"s$i", open = true, lo, hi, Nil)
    }
    writeIdx(shards)
  }

  def shards(): Seq[Shard] = this.synchronized { readIdx() }

  private def readIdx(): Seq[Shard] =
    Files.readAllLines(idxPath).toArray(Array.empty[String]).toSeq
      .filter(_.nonEmpty).map { l =>
        val Array(id, st, lo, hi, ps) = l.split("\\|", 5)
        Shard(id, st == "open", lo.toLong, hi.toLong,
          ps.split(",").toSeq.filter(_.nonEmpty))
      }

  private def writeIdx(shards: Seq[Shard]): Unit = {
    val body = shards.map(s =>
      s"${s.id}|${if (s.open) "open" else "closed"}|${s.hashLo}|${s.hashHi}|" +
        s.parents.mkString(",")).mkString("", "\n", "\n")
    val tmp = root.resolve(s".shards.idx.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, idxPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Highest assigned sequence number in `shardId` (0 = empty). */
  def maxSeq(shardId: String): Long = this.synchronized {
    val d = shardDir(shardId)
    if (!Files.isDirectory(d)) 0L
    else {
      val s = Files.list(d)
      try s.toArray.map(_.asInstanceOf[Path].getFileName.toString)
        .filter(_.startsWith("r-")).map(_.stripPrefix("r-").toLong)
        .foldLeft(0L)(math.max)
      finally s.close()
    }
  }

  /** Route `data` by `partitionKey` to its open shard; returns
    * (shardId, assigned sequence number). */
  def put(partitionKey: String, data: String): (String, Long) = this.synchronized {
    val h = keyHash(partitionKey)
    val shard = readIdx().find(s => s.open && h >= s.hashLo && h < s.hashHi)
      .getOrElse(sys.error(
        s"no open shard covers hash $h — the map must always partition the range"))
    Files.createDirectories(shardDir(shard.id))
    var seq = maxSeq(shard.id) + 1L
    var done = false
    while (!done) {
      try {
        Files.write(recPath(shard.id, seq), data.getBytes(UTF_8),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        done = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => seq += 1L
      }
    }
    (shard.id, seq)
  }

  /** Records of `shardId` with seq in (afterSeq, toSeq], in sequence
    * order — the GetRecords page. */
  def get(shardId: String, afterSeq: Long,
          toSeq: Long = Long.MaxValue): Seq[(Long, String)] = {
    val d = shardDir(shardId)
    if (!Files.isDirectory(d)) return Nil
    val s = Files.list(d)
    val names =
      try s.toArray.map(_.asInstanceOf[Path].getFileName.toString)
        .filter(_.startsWith("r-")).map(_.stripPrefix("r-").toLong)
        .filter(q => q > afterSeq && q <= toSeq).sorted.toSeq
      finally s.close()
    names.map(q => q -> new String(Files.readAllBytes(recPath(shardId, q)), UTF_8))
  }

  /** Split an open shard at its hash-range midpoint: the parent closes,
    * two children cover its halves. Returns the child ids. */
  def split(shardId: String): (String, String) = this.synchronized {
    val all = readIdx()
    val s = all.find(_.id == shardId).getOrElse(sys.error(s"no shard $shardId"))
    require(s.open, s"cannot split closed shard $shardId")
    require(s.hashHi - s.hashLo >= 2L, s"shard $shardId range too narrow to split")
    val mid = s.hashLo + (s.hashHi - s.hashLo) / 2L
    val next = all.map(_.id).map(_.stripPrefix("s").takeWhile(_.isDigit))
      .filter(_.nonEmpty).map(_.toLong).foldLeft(0L)(math.max) + 1L
    val (a, b) = (s"s$next", s"s${next + 1L}")
    writeIdx(all.map(x => if (x.id == shardId) x.copy(open = false) else x) ++ Seq(
      Shard(a, open = true, s.hashLo, mid, Seq(shardId)),
      Shard(b, open = true, mid, s.hashHi, Seq(shardId))))
    (a, b)
  }

  /** Merge two ADJACENT open shards: both close, one child covers the
    * union. Returns the child id. */
  def merge(aId: String, bId: String): String = this.synchronized {
    val all = readIdx()
    val a = all.find(_.id == aId).getOrElse(sys.error(s"no shard $aId"))
    val b = all.find(_.id == bId).getOrElse(sys.error(s"no shard $bId"))
    require(a.open && b.open, "can only merge open shards")
    val (lo, hi) = (math.min(a.hashLo, b.hashLo), math.max(a.hashHi, b.hashHi))
    require(a.hashHi == b.hashLo || b.hashHi == a.hashLo,
      s"shards $aId and $bId are not adjacent")
    val next = all.map(_.id).map(_.stripPrefix("s").takeWhile(_.isDigit))
      .filter(_.nonEmpty).map(_.toLong).foldLeft(0L)(math.max) + 1L
    val child = s"s$next"
    writeIdx(all.map(x =>
      if (x.id == aId || x.id == bId) x.copy(open = false) else x) :+
      Shard(child, open = true, lo, hi, Seq(aId, bId)))
    child
  }
}
