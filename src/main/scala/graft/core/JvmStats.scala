package graft.core

/** Process-level run-condition probes shared by every timed receipt
  * (the bench's suite/rehearsal receipts and the gold runner's
  * per-pipeline ledger): wall time alone cannot distinguish "the plan
  * is slow" from "the box was busy" or "the JVM was collecting" —
  * cpu ≈ wall·cores reads hot plan, low cpu with flat gc reads
  * co-tenant load, high gc reads heap pressure. */
object JvmStats {

  /** Cumulative process CPU seconds (-1 when the platform bean is
    * unavailable). */
  def procCpuSec: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  /** Cumulative stop-the-world GC seconds across all collectors. */
  def gcSec: Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum / 1000.0
  }
}
