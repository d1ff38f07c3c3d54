package graft.tools

import graft.core.GraftSession
import graft.pipelines.GoldContext
import graft.queries.BiServer

/** Stand up the BI endpoint over an existing warehouse:
  * `runMain graft.tools.Serve WAREHOUSE_DIR [PORT]` — registers the
  * gold views and serves HiveServer2 Thrift on PORT (default 10000)
  * until killed. Attach with any Hive/Spark JDBC client, e.g.
  * `beeline -u jdbc:hive2://localhost:10000/default`. */
object Serve {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Serve WAREHOUSE_DIR [PORT]")
    val port = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val ctx = new GoldContext(spark, args.head)
    BiServer.serve(ctx, port)
    System.err.println(s"[serve] thrift endpoint on localhost:$port — Ctrl-C to stop")
    Thread.currentThread.join() // serve until killed
  }
}
