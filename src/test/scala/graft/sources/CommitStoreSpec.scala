package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** The commit-atomicity seam: the optimistic claim loops must
  * serialize through ANY [[CommitStore]] whose version claim is
  * fail-closed — including an object-store-shaped one whose "rename"
  * is copy+delete (non-atomic data movement) and whose claims
  * spuriously fail (a racing conditional put). The POSIX default's
  * put-if-absent contract is pinned directly. */
class CommitStoreSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def df(t: (Long, Long, String)*): DataFrame =
    t.toDF("id", "price", "tag")

  private def rows(d: DataFrame): Seq[String] =
    d.collect().map(_.toString).sorted.toSeq

  /** Object-store emulation (the S3+coordinator shape): the version
    * CLAIM is a putIfAbsent on a concurrent map (the conditional put /
    * DynamoDB LogStore entry — the only atomic primitive assumed), the
    * data then moves by per-file COPY + DELETE — deliberately not a
    * rename, and deliberately after the claim. `spuriousLosses` makes
    * the first N claims report "lost" even when free, forcing the
    * callers' rebase loops to run. */
  private final class ObjectStoreSim(spuriousLosses: Int) extends CommitStore {
    val claims = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    // a version is COMMITTED when its copy finished — the claim record,
    // not the directory listing, is the log (the seam's list contract)
    val completed = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    private val spurious =
      new java.util.concurrent.atomic.AtomicInteger(spuriousLosses)
    val lostClaims = new java.util.concurrent.atomic.AtomicInteger(0)

    private def key(root: Path, version: Long): String =
      root.resolve(s"v=$version").toString

    override def publishVersion(root: Path, staged: Path,
                                version: Long): Boolean = {
      if (spurious.getAndUpdate(x => math.max(0, x - 1)) > 0) {
        lostClaims.incrementAndGet()
        return false
      }
      val target = root.resolve(s"v=$version")
      val won = Files.notExists(target) &&
        claims.putIfAbsent(key(root, version), true) == null
      if (!won) { lostClaims.incrementAndGet(); return false }
      // non-atomic data movement AFTER the atomic claim: copy the
      // staged tree file by file, then delete the staging dir; a
      // racing lister must not see this half-copied dir as committed
      Files.createDirectories(target)
      val stream = Files.walk(staged)
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          val p = it.next()
          val rel = staged.relativize(p)
          if (Files.isDirectory(p)) {
            if (rel.toString.nonEmpty)
              Files.createDirectories(target.resolve(rel.toString))
          } else Files.copy(p, target.resolve(rel.toString))
        }
      } finally stream.close()
      Versioned.deleteRecursively(staged)
      completed.put(key(root, version), true)
      true
    }

    override def publishFile(target: Path, bytes: Array[Byte]): Unit =
      PosixCommitStore.publishFile(target, bytes)

    // the log: every directory the sim didn't claim (pre-existing
    // history) plus claims whose copy COMPLETED — never an in-flight one
    override def listVersions(root: Path): Seq[Long] =
      PosixCommitStore.listVersions(root).filter { v =>
        val k = key(root, v)
        !claims.containsKey(k) || completed.containsKey(k)
      }

    override def latestVersion(root: Path): Option[Long] =
      listVersions(root).lastOption
  }

  test("PosixCommitStore.publishVersion is put-if-absent: an existing " +
      "version loses the claim and the staging dir survives for rebase") {
    val root = Files.createTempDirectory("cs_posix_")
    Files.createDirectories(root.resolve("v=0"))
    val staged = Files.createTempDirectory(root, "_staging_")
    Files.write(staged.resolve("part-x.parquet"), Array[Byte](1, 2, 3))
    assert(!PosixCommitStore.publishVersion(root, staged, 0L),
      "claiming an existing version must fail closed")
    assert(Files.isDirectory(staged) &&
      Files.exists(staged.resolve("part-x.parquet")),
      "a lost claim must leave the staged output intact for the retry")
    assert(PosixCommitStore.publishVersion(root, staged, 1L))
    assert(Files.exists(root.resolve("v=1").resolve("part-x.parquet")))
    assert(Files.notExists(staged))
  }

  test("publishFile replaces atomically and leaves no sweepable temp") {
    val root = Files.createTempDirectory("cs_hint_")
    val target = root.resolve("_graft_latest")
    PosixCommitStore.publishFile(target, "7".getBytes)
    assert(new String(Files.readAllBytes(target)) === "7")
    PosixCommitStore.publishFile(target, "8".getBytes)
    assert(new String(Files.readAllBytes(target)) === "8")
    val stream = Files.list(root)
    val leftovers =
      try {
        val it = stream.iterator()
        var acc = List.empty[String]
        while (it.hasNext) acc ::= it.next().getFileName.toString
        acc.filter(_.endsWith(".tmp"))
      } finally stream.close()
    assert(leftovers.isEmpty, s"tmp leftovers: $leftovers")
  }

  test("concurrent appends serialize through a copy+delete object-store " +
      "sim with racing claims (the claim loop, not rename, is the truth)") {
    val sim = new ObjectStoreSim(spuriousLosses = 3)
    CommitStore.withStore(sim) {
      val root = Files.createTempDirectory("cs_sim_").toString
      df((0L, 0L, "base")).write.format("graft-versioned")
        .option("create", "true").mode("append").save(root)
      val schema = df((0L, 0L, "")).schema
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 4).map { i =>
        new Thread(() => {
          try {
            val bw = new GraftBatchWrite(root, schema, replace = false,
              commitTs = Some(1000L + i), queryId = s"cs$i")
            val w = bw.createBatchWriterFactory(null).createWriter(0, i.toLong)
            w.write(org.apache.spark.sql.catalyst.InternalRow(
              i.toLong, i * 10L,
              org.apache.spark.unsafe.types.UTF8String.fromString(s"w$i")))
            bw.commit(Array(w.commit()))
          } catch { case t: Throwable => errors.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(60000))
      assert(errors.isEmpty, s"concurrent commit failed: ${errors.peek()}")
      assert(sim.lostClaims.get() >= 3,
        "the spurious losses must have exercised the rebase loop")
      // serialized into distinct versions, nothing lost to a stale link
      assert(Versioned.versions(root) === Seq(0L, 1L, 2L, 3L, 4L))
      assert(rows(Versioned.read(spark, root)) === rows(df(
        (0L, 0L, "base"), (1L, 10L, "w1"), (2L, 20L, "w2"),
        (3L, 30L, "w3"), (4L, 40L, "w4"))))
      // every version's content came through the copy+delete path —
      // the sim, not posix rename, published them all
      assert(sim.claims.size() === 5)
    }
  }

  test("row-level commits rebase through the sim exactly as on POSIX " +
      "(disjoint DV deletes both land)") {
    val sim = new ObjectStoreSim(spuriousLosses = 1)
    CommitStore.withStore(sim) {
      val root = Files.createTempDirectory("cs_rl_").toString
      df((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
        .repartition(3, $"id").write.format("graft-versioned")
        .option("create", "true").mode("append").save(root)
      import org.apache.spark.sql.functions.col
      VersionedWriteIo.deleteViaDv(spark, root, col("id") === 1L)
      VersionedWriteIo.deleteViaDv(spark, root, col("id") === 3L)
      assert(rows(Versioned.read(spark, root)) === rows(df((2L, 20L, "b"))))
      assert(Versioned.versions(root) === Seq(0L, 1L, 2L))
    }
  }
}
