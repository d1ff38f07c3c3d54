package graft.queries

import org.apache.hive.service.server.HiveServer2
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

import graft.pipelines.GoldContext

/** Network BI endpoint (A8) — the counterpart of the reference serving
  * Superset over ClickHouse's HTTP port (README.md:167-173). Spark's
  * native BI protocol is HiveServer2 Thrift: [[serve]] registers the
  * gold views and binds a JDBC/ODBC endpoint on `port`, so any BI tool
  * with a Hive/Spark driver (Superset's `hive://` SQLAlchemy URI,
  * beeline, Tableau) attaches to the same dedupe-on-read views that
  * in-process `spark.sql` sees.
  *
  * `singleSession=true` makes every JDBC session share this session's
  * (temp-view) catalog — the same single-warehouse read model as the
  * reference's one ClickHouse endpoint.
  *
  * Known side effect of sharing: the thrift stack enables
  * `spark.sql.datetime.java8API.enabled` on the session for its wire
  * serialization, so driver-side `collect()` afterwards yields
  * `java.time.Instant`/`LocalDate` instead of `java.sql` types (stored
  * data and SQL semantics are unaffected). Reset the conf if mixed
  * in-process collection must keep the legacy types.
  */
object BiServer {

  /** Returns the server handle typed as its public parent (the
    * concrete HiveThriftServer2 class is private[hive]); `stop()` it
    * to release the port. */
  def serve(ctx: GoldContext, port: Int): HiveServer2 = {
    val registered = GoldViews.registerAll(ctx)
    // singleSession is a STATIC conf (graft.core.GraftSession sets it):
    // when this session was built elsewhere without it, each JDBC
    // connection gets its own session state and temp views are
    // invisible — publish the views globally so remote clients still
    // reach them as global_temp.<table>
    val single = ctx.spark.conf
      .getOption("spark.sql.hive.thriftServer.singleSession").contains("true")
    if (!single) registered.foreach(t =>
      ctx.spark.table(t).createOrReplaceGlobalTempView(t))
    ctx.spark.conf.set("hive.server2.thrift.port", port.toString)
    ctx.spark.conf.set("hive.server2.thrift.bind.host", "localhost")
    HiveThriftServer2.startWithContext(ctx.spark.sqlContext)
  }
}
