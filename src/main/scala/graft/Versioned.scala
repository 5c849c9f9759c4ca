package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Manifest-versioned tables — the lakehouse transaction-log pattern
  * (Delta/Iceberg's core idea) in its minimal correct form:
  *
  *  - data files are IMMUTABLE and write-once under `path/data/<uuid>/`;
  *  - what constitutes the table is a MANIFEST (`path/_log/v<n>.manifest`)
  *    listing the live files; committing a write = renaming one tmp
  *    manifest into place — a single-file rename, atomic on every
  *    Hadoop-compatible FS (unlike the directory swaps in
  *    [[Lake.compact]]/[[Lake.upsert]], which have a crash window this
  *    layer exists to close);
  *  - readers resolve a manifest ONCE and read exactly its files: a
  *    reader never sees a half-written table, concurrent writers never
  *    disturb a running query (snapshot isolation), and old versions stay
  *    readable (time travel) until vacuumed;
  *  - concurrent committers race on the rename; the loser re-resolves the
  *    latest version and retries (optimistic concurrency).
  *
  * At 100 TB the manifest is metadata (file list), the data plane is
  * plain parquet, and `replacePartitions` gives UPSERT/compaction an
  * atomic publish: stage new files for the touched partitions, commit one
  * manifest that drops the old ones — zero renames of live data.
  */
object Versioned {

  final case class FileEntry(file: String, part: Option[String])
  final case class Manifest(version: Long, partCol: Option[String],
      partType: Option[String], files: Seq[FileEntry])

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = new Path(s"$path/_log")

  private val ManifestName = """v(\d{8})\.manifest""".r

  /** Highest committed version, or None for a fresh table. */
  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val fs = fsOf(spark, path)
    if (!fs.exists(logDir(path))) None
    else fs.listStatus(logDir(path)).toSeq
      .collect { case s if ManifestName.findFirstIn(s.getPath.getName).isDefined =>
        ManifestName.findFirstMatchIn(s.getPath.getName).get.group(1).toLong
      }.maxOption
  }

  // ---- manifest serialization: line-based, dependency-free ----
  private def render(m: Manifest): String = {
    val head = Seq(
      s"version=${m.version}",
      s"partCol=${m.partCol.getOrElse("")}",
      s"partType=${m.partType.getOrElse("")}")
    // '\u0001' separator: never appears in hive partition dir names
    val files = m.files.map(f => s"file=${f.file}\u0001${f.part.getOrElse("")}")
    (head ++ files).mkString("\n")
  }

  private def parse(text: String): Manifest = {
    val lines = text.split("\n").toSeq
    def kv(k: String): String = lines.find(_.startsWith(s"$k="))
      .map(_.drop(k.length + 1)).getOrElse("")
    val files = lines.filter(_.startsWith("file=")).map { l =>
      val body = l.drop(5)
      val i = body.indexOf('\u0001')
      FileEntry(body.substring(0, i),
        Option(body.substring(i + 1)).filter(_.nonEmpty))
    }
    Manifest(kv("version").toLong,
      Option(kv("partCol")).filter(_.nonEmpty),
      Option(kv("partType")).filter(_.nonEmpty), files)
  }

  def readManifest(spark: SparkSession, path: String,
      version: Option[Long] = None): Manifest = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      sys.error(s"$path has no committed versions"))
    val fs = fsOf(spark, path)
    val p = new Path(logDir(path), f"v$v%08d.manifest")
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      parse(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }

  /** Atomic commit via tmp-write + rename; on a lost race (version taken),
    * recompute against the NEW latest and retry. `build` receives the
    * previous manifest (None for a fresh table) and returns the new file
    * list + partition metadata. */
  private def commit(spark: SparkSession, path: String)(
      build: Option[Manifest] => (Seq[FileEntry], Option[String], Option[String])): Long = {
    val fs = fsOf(spark, path)
    fs.mkdirs(logDir(path))
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val prevV = latestVersion(spark, path)
      val prev = prevV.map(v => readManifest(spark, path, Some(v)))
      val (files, pc, pt) = build(prev)
      val next = prevV.getOrElse(-1L) + 1
      val m = Manifest(next, pc, pt, files)
      val tmp = new Path(logDir(path),
        s".v$next-${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try out.write(render(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // the atomic publish: exactly one racer's rename lands v<next>
      if (fs.rename(tmp, new Path(logDir(path), f"v$next%08d.manifest")))
        return next
      fs.delete(tmp, false) // lost the race — retry against the new tip
    }
    sys.error(s"commit to $path lost ${attempts} optimistic races; giving up")
  }

  /** Stage `df` as immutable files under data/<uuid>, returning entries
    * (with hive partition values parsed from dir names when partitioned). */
  private def stage(df: DataFrame, path: String,
      partitionBy: Option[String]): Seq[FileEntry] = {
    val uuid = java.util.UUID.randomUUID().toString
    val dest = s"$path/data/$uuid"
    partitionBy match {
      case Some(pc) => df.write.partitionBy(pc).parquet(dest)
      case None => df.write.parquet(dest)
    }
    val fs = fsOf(df.sparkSession, path)
    def walk(p: Path): Seq[Path] = fs.listStatus(p).toSeq.flatMap { s =>
      if (s.isDirectory) walk(s.getPath)
      else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath) else Nil
    }
    val rootAbs = fs.makeQualified(new Path(path)).toString
    walk(new Path(dest)).map { f =>
      val rel = fs.makeQualified(f).toString.stripPrefix(rootAbs).stripPrefix("/")
      val part = partitionBy.map { pc =>
        f.getParent.getName.stripPrefix(s"$pc=")
      }
      FileEntry(rel, part)
    }
  }

  /** Write a new snapshot. `mode` = "overwrite" (files replace the table)
    * or "append". Returns the committed version. */
  def write(df: DataFrame, path: String, mode: String = "overwrite",
      partitionBy: Option[String] = None): Long = {
    val partType = partitionBy.map(pc => df.schema(pc).dataType.sql)
    val staged = stage(df, path, partitionBy)
    commit(df.sparkSession, path) { prev =>
      val kept = mode match {
        case "overwrite" => Nil
        case "append" => prev.map(_.files).getOrElse(Nil)
        case other => sys.error(s"unknown mode $other")
      }
      (kept ++ staged, partitionBy.orElse(prev.flatMap(_.partCol)),
        partType.orElse(prev.flatMap(_.partType)))
    }
  }

  /** Atomically replace exactly the partitions present in `df` — the
    * transactional publish for upsert/compaction maintenance: stage the
    * rewritten partitions, commit one manifest that swaps them in. A
    * crash before the commit leaves the table untouched (orphan staged
    * files only); readers never see a partial state. */
  def replacePartitions(df: DataFrame, path: String, partCol: String): Long = {
    val staged = stage(df, path, Some(partCol))
    val replaced = staged.flatMap(_.part).toSet
    val partType = df.schema(partCol).dataType.sql
    commit(df.sparkSession, path) { prev =>
      val kept = prev.map(_.files).getOrElse(Nil)
        .filterNot(f => f.part.exists(replaced.contains))
      (kept ++ staged, Some(partCol), Some(partType))
    }
  }

  /** Read a snapshot (latest, or `version` for time travel). Partitioned
    * tables get their partition column reconstructed from the manifest
    * (per-value file groups + a cast literal — files are read directly,
    * so no directory listing of the data plane ever happens). */
  def read(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val m = readManifest(spark, path, version)
    require(m.files.nonEmpty, s"version ${m.version} of $path is empty")
    def abs(f: FileEntry) = s"$path/${f.file}"
    (m.partCol, m.partType) match {
      case (Some(pc), Some(pt)) =>
        m.files.groupBy(_.part).toSeq.sortBy(_._1).map { case (pv, fs) =>
          spark.read.parquet(fs.map(abs): _*)
            .withColumn(pc, lit(pv.orNull).cast(pt))
        }.reduce(_ unionByName _)
      case _ =>
        spark.read.parquet(m.files.map(abs): _*)
    }
  }

  /** Transactional keyed MERGE INTO — [[Lake.upsert]]'s semantics with an
    * ATOMIC publish: read only the touched partitions of the CURRENT
    * snapshot, drop rows superseded by an update key (broadcast
    * anti-join), and commit merged + untouched partitions in one manifest
    * rename. A crash at any point leaves the previous version fully
    * readable; concurrent readers never observe the intermediate state.
    * Same stability constraint: a key's `partCol` value must not change
    * across versions. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], partCol: String): Long = {
    import org.apache.spark.sql.functions.broadcast
    val touched = updates.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    val current = read(spark, path)
      .filter(col(partCol).isInCollection(touched))
    val kept = current.join(
      broadcast(updates.select(keys.map(col): _*).distinct()),
      keys, "left_anti")
    val merged = kept.unionByName(updates.select(current.columns.map(col): _*))
    replacePartitions(merged, path, partCol)
  }

  /** Delete data files no longer referenced by any manifest newer than
    * `keepVersions` back — the GC that makes time travel bounded. */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 2): Long = {
    val fs = fsOf(spark, path)
    val latest = latestVersion(spark, path).getOrElse(return 0L)
    val keep = (math.max(0L, latest - keepVersions + 1) to latest)
      .flatMap(v => readManifest(spark, path, Some(v)).files.map(_.file)).toSet
    // drop superseded manifests too
    (0L until math.max(0L, latest - keepVersions + 1)).foreach { v =>
      fs.delete(new Path(logDir(path), f"v$v%08d.manifest"), false)
    }
    val dataRoot = new Path(s"$path/data")
    if (!fs.exists(dataRoot)) return 0L
    var removed = 0L
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      if (s.isDirectory) {
        walk(s.getPath)
        if (fs.listStatus(s.getPath).isEmpty) { fs.delete(s.getPath, false); () }
      } else {
        val rel = fs.makeQualified(s.getPath).toString
          .stripPrefix(fs.makeQualified(new Path(path)).toString).stripPrefix("/")
        if (s.getPath.getName.endsWith(".parquet") && !keep.contains(rel)) {
          fs.delete(s.getPath, false); removed += 1
        }
      }
    }
    walk(dataRoot)
    removed
  }
}
