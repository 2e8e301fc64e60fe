package graft.sources

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** Segment-backed manifest encoding — Iceberg's manifest-reuse shape
  * (a snapshot's manifest list references immutable manifest files;
  * appends add one and reuse the rest) in this table format's
  * line-token idiom.
  *
  * A published manifest `_manifest/<v>.txt` holds small LINE TOKENS:
  * {{{
  *   M k=v      snapshot metadata                    (existing)
  *   I <name>   include every entry of the immutable
  *              segment `_manifest/seg/<name>`       (new)
  *   X <path>   exclude <path> from included
  *              segments — a rewrite's removals      (new)
  *   D <entry>  delete-file (DV) entry, inline       (existing)
  *   <entry>    inline data entry                    (legacy manifests)
  * }}}
  * Segments hold raw data-entry lines (`path` or `path\tstatsJson`,
  * exactly the inline format) and are IMMUTABLE once renamed into
  * place, so they are shared across versions and cached per JVM: an
  * append commit writes ONE segment holding just its delta and
  * references the prior snapshot's segments by name — commit metadata
  * is O(delta + segment count), not O(table files). Per-file stats
  * (min/max, blooms, theta NDV, KLL) ride in segment entries and are
  * therefore written ONCE per file lifetime, where the flat encoding
  * re-serialized every sketch of every file on every commit. At 100 TB
  * file counts (~1M files) that is the difference between a ~KB and a
  * ~GB metadata write per append.
  *
  * Planning is fail-safe by construction: [[plan]] diffs the desired
  * entry list against the base snapshot's, emits reuse tokens only for
  * the exact append / subset-removal shapes, and then VERIFIES the
  * planned tokens expand to the desired list verbatim — any mismatch
  * (reordering, a same-path stats change, a legacy inline base) falls
  * back to writing one fresh consolidated segment. Readers expand
  * tokens back to the flat entry list, so every consumer above
  * [[VersionedTable.snapshotOf]] is untouched.
  */
private[graft] object LakeManifest {

  /** Entry-token of a raw (unexpanded) manifest body. */
  sealed trait Token
  final case class SegRef(name: String) extends Token
  final case class Inline(line: String) extends Token

  /** A manifest parsed to tokens, before segment expansion. */
  final case class Raw(metaLines: Seq[String], tokens: Seq[Token],
      excludes: Set[String], deleteLines: Seq[String]) {
    def segNames: Seq[String] = tokens.collect { case SegRef(n) => n }
    def fullySegmented: Boolean = !tokens.exists(_.isInstanceOf[Inline])
  }

  def segDir(dir: String): Path = new Path(s"$dir/_manifest/seg")

  /** Max segments a snapshot may reference before a commit rewrites
    * one consolidated segment (metadata compaction): bounds the
    * per-read segment fan-in the way Delta's checkpoint bounds log
    * replay. */
  val MaxSegments = 64

  /** Max carried exclusions before consolidation: X lines are the
    * rewrite-delta tombstones, and letting them accumulate past this
    * would make manifests grow with DML history instead of state. */
  val MaxExcludes = 10000

  private def entryPath(line: String): String = {
    val i = line.indexOf('\t')
    if (i < 0) line else line.take(i)
  }

  def parseRaw(text: String): Raw = {
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val metaLines = Seq.newBuilder[String]
    val tokens = Seq.newBuilder[Token]
    val excludes = Set.newBuilder[String]
    val deletes = Seq.newBuilder[String]
    lines.foreach {
      case l if l.startsWith("M ") => metaLines += l
      case l if l.startsWith("I ") => tokens += SegRef(l.drop(2))
      case l if l.startsWith("X ") => excludes += l.drop(2)
      case l if l.startsWith("D ") => deletes += l.drop(2)
      case l => tokens += Inline(l)
    }
    Raw(metaLines.result(), tokens.result(), excludes.result(),
      deletes.result())
  }

  // ---- segment IO (immutable → cacheable forever, size-capped) ----

  private val cache = new ConcurrentHashMap[String, Seq[String]]()
  private val CacheCap = 256

  private[graft] def segmentLines(f: FileSystem, dir: String,
      name: String): Seq[String] = {
    val p = new Path(segDir(dir), name)
    val key = f.makeQualified(p).toString
    val hit = cache.get(key)
    if (hit != null) return hit
    val in = f.open(p)
    val bytes =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    val lines =
      new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
    if (cache.size >= CacheCap) cache.clear() // coarse cap; refills warm
    cache.put(key, lines)
    lines
  }

  /** Write `lines` as a new immutable segment for version `v`; returns
    * the segment NAME (manifest-relative — clones re-anchor by writing
    * their own segments, so names never cross table roots). Written to
    * a temp name and renamed like the manifest itself; a commit that
    * loses the publish race orphans its segment exactly as it orphans
    * its data files. */
  private[sources] def writeSegment(f: FileSystem, dir: String, v: Int,
      lines: Seq[String]): String = {
    val name = s"s$v-${UUID.randomUUID().toString.take(8)}.txt"
    f.mkdirs(segDir(dir))
    val tmp = new Path(segDir(dir), s".$name.tmp")
    val out = f.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(segDir(dir), name)))
      throw new IllegalStateException(
        s"segment $name lost a rename race at $dir")
    name
  }

  /** Expand a raw manifest to its flat (dataLines, deleteLines).
    * Exclusions apply to SEGMENT-sourced entries only: an inline entry
    * is always this manifest's own explicit word. */
  def expand(f: FileSystem, dir: String, raw: Raw)
      : (Seq[String], Seq[String]) = {
    val data = raw.tokens.flatMap {
      case Inline(l) => Seq(l)
      case SegRef(n) =>
        val seg = segmentLines(f, dir, n)
        if (raw.excludes.isEmpty) seg
        else seg.filterNot(l => raw.excludes.contains(entryPath(l)))
    }
    (data, raw.deleteLines)
  }

  /** Plan version `v`'s manifest text for the `desired` data-entry
    * lines (in order), `deleteLines`, and `metaLines`, reusing the
    * base snapshot's segments where the diff is an exact append or
    * subset-removal(+append). Writes at most one new segment. The
    * planned tokens are re-expanded and verified against `desired`
    * before being returned — on any mismatch the plan is one fresh
    * consolidated segment, which is behavior-identical to the flat
    * encoding. */
  def plan(f: FileSystem, dir: String, baseRaw: Option[Raw],
      v: Int, metaLines: Seq[String], desired: Seq[String],
      deleteLines: Seq[String]): String = {

    def render(tokens: Seq[Token], excludes: Set[String]): String = {
      val body = tokens.map {
        case SegRef(n) => s"I $n"
        case Inline(l) => l
      } ++ excludes.toSeq.sorted.map(p => s"X $p") ++
        deleteLines.map(l => s"D $l")
      (metaLines ++ body).mkString("\n") + "\n"
    }

    def fullWrite(): String = {
      if (desired.isEmpty) return render(Seq.empty, Set.empty)
      val name = writeSegment(f, dir, v, desired)
      render(Seq(SegRef(name)), Set.empty)
    }

    baseRaw match {
      case Some(raw) if raw.fullySegmented &&
          raw.segNames.size < MaxSegments &&
          raw.excludes.size < MaxExcludes =>
        val (baseEff, _) = expand(f, dir, raw)
        val desiredPaths = desired.iterator.map(entryPath).toSet
        val basePaths = baseEff.iterator.map(entryPath).toSet
        val removed = baseEff.iterator.map(entryPath)
          .filterNot(desiredPaths.contains).toSet
        val carried = baseEff.filterNot(l =>
          removed.contains(entryPath(l)))
        val tail = desired.drop(carried.size)
        val tailIsNew = tail.forall(l => !basePaths.contains(entryPath(l)))
        // reuse only while MOST of the base survives: a full replace
        // (overwrite/compact/truncate) or a majority rewrite gets one
        // consolidated segment — carrying refs whose entries are all
        // excluded would pin dead segments and bloat the X list
        if (carried.nonEmpty && removed.size * 2 <= baseEff.size &&
            desired.take(carried.size) == carried && tailIsNew &&
            raw.excludes.size + removed.size < MaxExcludes) {
          val tokens =
            if (tail.isEmpty) raw.tokens
            else raw.tokens :+ SegRef(writeSegment(f, dir, v, tail))
          val excludes = raw.excludes ++ removed
          // fail-safe verification: the planned manifest must read
          // back EXACTLY as the flat encoding would
          val check = expand(f, dir,
            Raw(metaLines, tokens, excludes, deleteLines))._1
          if (check == desired) render(tokens, excludes)
          else fullWrite()
        } else fullWrite()
      case _ => fullWrite()
    }
  }

  /** Segment names referenced by `raws` — vacuum keeps exactly these. */
  def referencedSegments(raws: Seq[Raw]): Set[String] =
    raws.flatMap(_.segNames).toSet
}
