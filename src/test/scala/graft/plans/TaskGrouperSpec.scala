package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Properties mirroring the reference's own grouper tests
  * (`iceberg_file_task_scan.rs:346-465`): balance bound, empty/single/skew
  * cases, and 10k-iteration determinism. Seeded randoms instead of
  * ScalaCheck generators (scalatestplus bridge not on the offline
  * classpath); 200 random cases per property.
  */
class TaskGrouperSpec extends AnyFunSuite {

  import TaskGrouper._

  private def randomTasks(rnd: Random): Seq[ScanTask] = {
    val n = rnd.nextInt(200)
    (0 until n).map(i => ScanTask(s"f$i", rnd.nextLong(1000000L) + 1))
  }

  test("all tasks preserved, no duplicates") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val tasks = randomTasks(rnd)
      val n = rnd.nextInt(16) + 1
      val gs = group(tasks, n)
      assert(gs.size == n)
      assert(gs.flatten.sortBy(_.path) == tasks.sortBy(_.path))
    }
  }

  test("balance bound: max - min <= max task size") {
    val rnd = new Random(43)
    (1 to 200).foreach { _ =>
      val tasks = randomTasks(rnd)
      val n = rnd.nextInt(16) + 1
      if (tasks.nonEmpty) {
        val bytes = groupBytes(group(tasks, n))
        val maxTask = tasks.map(_.lengthBytes).max
        assert(bytes.max - bytes.min <= maxTask,
          s"unbalanced: $bytes maxTask=$maxTask")
      }
    }
  }

  test("empty input yields n empty groups") {
    assert(group(Nil, 4) == Vector.fill(4)(Vector.empty))
  }

  test("single task lands in exactly one group") {
    val gs = group(Seq(ScanTask("a", 10)), 4)
    assert(gs.count(_.nonEmpty) == 1)
  }

  test("skewed input: giant task isolated, rest spread") {
    val tasks = ScanTask("giant", 1000000L) +:
      (1 to 30).map(i => ScanTask(s"s$i", 10L))
    val gs = group(tasks, 4)
    val giantGroup = gs.find(_.exists(_.path == "giant")).get
    assert(giantGroup.size == 1)
  }

  test("deterministic across 10k iterations (reference :430-464)") {
    val tasks = (1 to 100).map(i => ScanTask(s"f$i", (i * 7919L) % 5000 + 1))
    val first = group(tasks, 8)
    (1 to 10000).foreach { _ => assert(group(tasks, 8) == first) }
  }
}
