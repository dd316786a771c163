package graft.sources

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Model-based randomized test of the version store: a seeded random
  * sequence of operations — DSv2 append, DSv2 overwrite, helper-path
  * writeNext, rollback, retention, compact — runs against BOTH the real
  * store and a trivial in-memory model (a vector of row-set snapshots).
  * After every op the store must agree with the model on the version
  * list, the current snapshot, and every pinned historical snapshot.
  * This is the interleaving coverage the per-feature specs can't give:
  * any divergence between the two write paths, or between lifecycle ops
  * and either path, surfaces as a mismatch at the exact op index. */
class VersionStoreModelSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def df(rows: Set[Long]): DataFrame =
    rows.toSeq.sorted.toDF("id")

  private def readSet(root: String, v: Option[Long]): Set[Long] =
    Versioned.read(spark, root, v).collect().map(_.getLong(0)).toSet

  private case class Model(snapshots: Vector[(Long, Set[Long])]) {
    def versions: Seq[Long] = snapshots.map(_._1)
    def current: Set[Long] = snapshots.last._2
  }

  test("random op sequences: store ≡ model on versions, current, and history") {
    val rnd = new scala.util.Random(42)
    for (run <- 1 to 3) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_model_${run}_").toString
      var nextId = 0L
      def freshRows(): Set[Long] = {
        val n = 1 + rnd.nextInt(4)
        val r = (0 until n).map(_ => { nextId += 1; nextId }).toSet
        r
      }
      // bootstrap v0 through the DSv2 writer
      val r0 = freshRows()
      df(r0).write.format("graft-versioned").option("create", "true")
        .option("commitTs", "1000").mode("append").save(root)
      var model = Model(Vector(0L -> r0))
      var ts = 1000L

      for (op <- 1 to 25) {
        ts += 10
        rnd.nextInt(6) match {
          case 0 => // DSv2 append: new version = prev ∪ rows
            val r = freshRows()
            df(r).write.format("graft-versioned")
              .option("commitTs", ts.toString).mode("append").save(root)
            model = Model(model.snapshots :+
              ((model.versions.last + 1) -> (model.current ++ r)))
          case 1 => // DSv2 overwrite: snapshot replace
            val r = freshRows()
            df(r).write.format("graft-versioned")
              .option("commitTs", ts.toString).mode("overwrite").save(root)
            model = Model(model.snapshots :+ ((model.versions.last + 1) -> r))
          case 2 => // helper-path writeNext: also a replace
            val r = freshRows()
            Versioned.writeNext(df(r), root, Some(ts))
            model = Model(model.snapshots :+ ((model.versions.last + 1) -> r))
          case 3 => // rollback (keep at least one version)
            if (model.snapshots.size > 1) {
              Versioned.rollback(root)
              model = Model(model.snapshots.init)
            }
          case 4 => // retention keep-2
            if (model.snapshots.size > 2) {
              Versioned.applyRetention(root, keep = 2)
              model = Model(model.snapshots.takeRight(2))
            }
          case 5 => // compact: same rows, NEW version number
            val v = Versioned.compact(spark, root)
            model = Model(model.snapshots :+ (v -> model.current))
        }
        assert(Versioned.versions(root) === model.versions,
          s"run $run op $op: version list diverged")
        assert(readSet(root, None) === model.current,
          s"run $run op $op: current snapshot diverged")
        model.snapshots.foreach { case (v, rows) =>
          assert(readSet(root, Some(v)) === rows,
            s"run $run op $op: pinned v=$v diverged")
        }
      }
      // the DSv2 reader agrees with the helper reader on the final state
      val dsv2 = spark.read.format("graft-versioned").load(root)
        .collect().map(_.getLong(0)).toSet
      assert(dsv2 === model.current)
    }
  }
}
