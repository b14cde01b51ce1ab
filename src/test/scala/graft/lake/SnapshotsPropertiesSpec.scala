package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Model-based property: a random sequence of rewrite/append/vacuum/
  * recover operations against a versioned table must track a trivial
  * in-memory model — every surviving version's read equals the model's
  * multiset, the version list matches, and recover on a healthy table
  * is a no-op. Seeded, so failures replay.
  */
class SnapshotsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("random op sequences track the in-memory model (two seeds)") {
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val root = Files.createTempDirectory(s"graft-snapprop$seed").toString + "/t"
      // model: committed version -> expected multiset of (k, v)
      var model = Map.empty[Long, Seq[(Long, Long)]]
      def freshRows(): Seq[(Long, Long)] =
        Seq.fill(1 + rnd.nextInt(5))((rnd.nextInt(6).toLong, rnd.nextLong(1000)))
      for (step <- 1 to 14) {
        rnd.nextInt(4) match {
          case 0 | 1 => // rewrite
            val rows = freshRows()
            val v = Snapshots.commitRewrite(root)(tmp =>
              rows.toDF("k", "v").write.parquet(tmp))
            model += v -> rows.sorted
          case 2 => // append: parent multiset plus the new rows
            val rows = freshRows()
            val parent = Snapshots.currentVersion(root)
            val v = Snapshots.commitAppend(root)(tmp =>
              rows.toDF("k", "v").write.parquet(tmp))
            val base = if (parent == 0L) Seq.empty else model(parent)
            model += v -> (base ++ rows).sorted
          case 3 if model.nonEmpty => // vacuum to a random horizon
            val keep = 1 + rnd.nextInt(3)
            Snapshots.vacuum(root, keep)
            val kept = model.keys.toSeq.sorted.takeRight(keep).toSet
            model = model.view.filterKeys(kept).toMap
          case _ => () // vacuum on an empty table: skip
        }
        // recover on a healthy table must change nothing
        if (step % 3 == 0) Snapshots.recover(root)
        assert(Snapshots.versions(root) == model.keys.toSeq.sorted,
          s"seed $seed step $step: version list diverged")
        model.foreach { case (v, expected) =>
          assert(rowsOf(Snapshots.readAt(spark, root, v)) == expected,
            s"seed $seed step $step: version $v content diverged")
        }
      }
    }
  }
}
