package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** File-backed message bus with the SAME producer/consumer contract as
  * [[KafkaBus]] — the reference's transport is a Kafka topic loop
  * (Pipeline.java:273-299 consumes a topic; Context.java:32 carries the
  * producer for `$send`/`$delay`/`$probe` fan-out), and this binding lets the
  * full topic-to-topic pipeline, restart included, run END TO END in
  * environments without a broker (CI, this sandbox, air-gapped clusters).
  *
  * Mapping of Kafka concepts onto a filesystem the cluster shares
  * (HDFS/S3/local — resolved through the Hadoop FileSystem of the session):
  *
  *  - **topic** → directory `<root>/topic=<name>/` of JSON-line files with
  *    the record schema `(key string, value string)` — the exact
  *    net.pincette.rs.streams.Message shape (Stage.java:16-17);
  *  - **produce** → `df.write.partitionBy("topic").mode("append")` of the
  *    shared [[Messages.routed]] frame: one DISTRIBUTED job appends files
  *    under each routed topic directory, the per-record `topic` column
  *    fanning out exactly like `ProducerRecord(topic, …)`. The
  *    FileOutputCommitter's task-commit rename makes files appear
  *    atomically, so a concurrently-tailing consumer never reads a
  *    half-written record — the append is the "ack";
  *  - **consume** → Spark's file streaming source tails each topic
  *    directory; processed-file tracking lives in the CHECKPOINT, which is
  *    this binding's consumer-group offset store: restarting with the same
  *    checkpoint resumes exactly where the killed run left off (the
  *    reference resumes committed group offsets, Util.java:47);
  *  - **retention** → files are never deleted here; a janitor (or
  *    `cleanSource=delete` on the reader) plays the log-cleaner role.
  *
  * Scale note: a produce is one Spark write job (no driver-side row
  * handling); a consume is an ordinary file-source scan, so a 1000-executor
  * cluster reads a backlog in parallel. The only metadata-scale state is
  * the file listing per trigger — bound it with `maxFilesPerTrigger` the
  * way `maxOffsetsPerTrigger` bounds the Kafka reader.
  */
final class FileBus(root: String) {

  require(root.nonEmpty, "bus root must be non-empty")

  /** The on-disk record shape: one JSON line per message. */
  private[graft] val recordSchema = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))

  def topicDir(topic: String): String = {
    require(topic.nonEmpty && !topic.contains("/") && !topic.contains(","),
      s"topic names must be non-empty path segments: $topic")
    s"$root/topic=$topic"
  }

  /** The file source refuses a nonexistent path, so subscribing creates the
    * topic — Kafka's auto.create.topics.enable analog. */
  private def ensure(spark: SparkSession, topic: String): Unit = {
    val p = new Path(topicDir(topic))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
  }

  /** Unbounded (key, <fields…>) rows from a topic subscription — feed
    * straight into `StreamingPipeline.start`. Each topic is its own file
    * source (its own offset log in the checkpoint), unioned like Kafka's
    * multi-topic `subscribe`. */
  def readStream(spark: SparkSession, topics: Seq[String],
      schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    require(topics.nonEmpty, "at least one topic to subscribe")
    val frames = topics.map { t =>
      ensure(spark, t)
      val r = spark.readStream.schema(recordSchema)
      maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n.toString))
        .json(topicDir(t))
    }
    Messages.parse(frames.reduce(_ unionByName _), schema)
  }

  /** Bounded read of a topic's current contents (batch replays/backfills,
    * and the assertion side of conformance tests). */
  def read(spark: SparkSession, topics: Seq[String],
      schema: StructType): DataFrame = {
    require(topics.nonEmpty, "at least one topic")
    val frames = topics.map { t =>
      ensure(spark, t)
      spark.read.schema(recordSchema).json(topicDir(t))
    }
    Messages.parse(frames.reduce(_ unionByName _), schema)
  }

  /** Raw (key, value) records of a topic, in no particular order. */
  def readRaw(spark: SparkSession, topic: String): DataFrame = {
    ensure(spark, topic)
    spark.read.schema(recordSchema).json(topicDir(topic))
  }

  /** Commit `write` into the bus through a PRODUCER-UNIQUE staging dir,
    * then rename the committed part files into place. A direct
    * `.mode("append")` on a shared directory is only safe for ONE producer
    * at a time: every Spark job stages under the same
    * `<dir>/_temporary/0/`, so two concurrent producers (Kafka's normal
    * model — e.g. an external feeder plus a pipeline's `$send`, possibly
    * in different JVMs) delete each other's staging on job commit
    * (round-15 soak find: `chmod: cannot access …/_temporary/…`). Staging
    * under `<root>/.staging/<uuid>` isolates the jobs; the per-file rename
    * is atomic on HDFS/local, so tailing consumers still never see a
    * half-written record. Part file names already carry a job UUID, so
    * renamed files never collide either. */
  private def commitThrough(spark: SparkSession, staging: String)(
      write: String => Unit)(destFor: String => String): Unit = {
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    sweepStaleStaging(fs)
    write(staging)
    val st = new Path(staging)
    try {
      if (fs.exists(st)) {
        val entries = fs.listStatus(st).toSeq
        val files = entries.filter(_.isFile) ++
          entries.filter(_.isDirectory)
            .flatMap(d => fs.listStatus(d.getPath).toSeq)
        for (f <- files if f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith(".")) {
          val dest = new Path(destFor(f.getPath.getParent.getName))
          fs.mkdirs(dest)
          // Hadoop rename reports most failures by returning FALSE, not
          // throwing — ignoring it would silently drop this file's records
          // when the staging dir is deleted below. Throwing makes the
          // produce FAIL LOUDLY; the caller retries (at-least-once, same
          // as a Kafka producer retry, which can also duplicate).
          if (!fs.rename(f.getPath, new Path(dest, f.getPath.getName)))
            throw new java.io.IOException(
              s"bus produce failed: could not move ${f.getPath} into $dest")
        }
      }
    } finally { fs.delete(st, true); () }
  }

  private def stagingDir(): String =
    s"$root/.staging/${java.util.UUID.randomUUID}"

  /** Best-effort reaper for staging dirs a KILLED producer left behind
    * (r15 advice: the in-process `finally` cleans up a crashed WRITE, but a
    * `kill -9`'d JVM — exactly the soak scenario — leaks its
    * `.staging/<uuid>` forever). Staleness is judged by the NEWEST file
    * anywhere under the entry, not the entry dir's own mtime: a long write
    * job lands task files under `_temporary/` subdirs without touching the
    * uuid dir, so an mtime test would reap a LIVE producer whose single
    * produce runs longer than the window — a dead producer's tree stops
    * changing, a live one keeps writing. Entries whose newest file is
    * older than 15 minutes are removed; the recursive listing is bounded
    * (staging entries are rare and small). Every failure is swallowed:
    * the sweep must never fail the produce it piggybacks on. */
  private def sweepStaleStaging(fs: org.apache.hadoop.fs.FileSystem): Unit =
    try {
      val st = new Path(s"$root/.staging")
      if (fs.exists(st)) {
        val cutoff = System.currentTimeMillis() - 15L * 60 * 1000
        fs.listStatus(st).foreach { d =>
          try {
            var newest = d.getModificationTime
            val it = fs.listFiles(d.getPath, true)
            while (it.hasNext) {
              val f = it.next()
              if (f.getModificationTime > newest)
                newest = f.getModificationTime
            }
            if (newest < cutoff) { fs.delete(d.getPath, true); () }
          } catch { case _: Throwable => () }
        }
      }
    } catch { case _: Throwable => () }

  /** Producer callback for `Pipeline(producer = …)` — the `$send`/`$delay`/
    * `$probe` transport. One distributed job per produce call; the
    * `__topic` routing column fans records out across topic directories.
    * Safe under CONCURRENT producers (see [[commitThrough]]). */
  def producer(defaultTopic: String): DataFrame => Unit = { batch =>
    commitThrough(batch.sparkSession, stagingDir()) { st =>
      Messages.routed(batch, defaultTopic)
        .write.partitionBy("topic").mode("overwrite").json(st)
    } { parent => s"$root/$parent" } // parent dir name is "topic=<name>"
  }

  /** Per-micro-batch collect sink for `StreamingPipeline.start(collect = …)`:
    * the batch→topic leg of the topic-to-topic loop. Concurrent-producer
    * safe like [[producer]]. */
  def collect(topic: String): DataFrame => Unit = { batch =>
    ensure(batch.sparkSession, topic)
    commitThrough(batch.sparkSession, stagingDir()) { st =>
      Messages.toJson(batch).write.mode("overwrite").json(st)
    } { _ => topicDir(topic) }
  }
}
