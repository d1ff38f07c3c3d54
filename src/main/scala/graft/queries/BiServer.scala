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
  *
  * Security seam, stated plainly: the endpoint is UNAUTHENTICATED
  * (hive.server2.authentication=NONE, the Spark default) — anyone who
  * can reach the port can run SQL with the server process's
  * privileges. The reference deploys the equivalent surface behind a
  * read-only database role and client-side limits
  * (superset/superset_config.py:1-2 ROW_LIMIT 50000 / 60 s timeout;
  * postgres/init/00_databases.sql:10-21 RBAC); in this library the
  * perimeter is deployment-level (bind to localhost / a private
  * interface, front with an authenticating proxy). What CAN be
  * enforced server-side is set here: incremental collect so a runaway
  * SELECT streams partition-by-partition instead of materializing the
  * full result on the driver heap, an operation/session idle timeout
  * mirroring the reference's 60 s statement posture, and a session
  * sweep interval so abandoned BI connections release resources.
  */
object BiServer {

  /** Returns the server handle typed as its public parent (the
    * concrete HiveThriftServer2 class is private[hive]); `stop()` it
    * to release the port.
    *
    * @param bindHost interface to bind; default localhost keeps the
    *   unauthenticated endpoint off the network — pass an interface
    *   address (or "0.0.0.0") deliberately to serve remote BI tools.
    * @param operationTimeoutMs idle-operation kill timer (≤0 disables):
    *   a statement whose client stops consuming is cancelled after
    *   this long, the server-side analog of the reference's 60 s
    *   client timeout. */
  def serve(ctx: GoldContext, port: Int, bindHost: String = "localhost",
      operationTimeoutMs: Long = 60000L): HiveServer2 = {
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
    val conf = ctx.spark.conf
    conf.set("hive.server2.thrift.port", port.toString)
    conf.set("hive.server2.thrift.bind.host", bindHost)
    // guardrails (see object scaladoc): stream results incrementally —
    // a full-table SELECT from a misconfigured dashboard must not
    // materialize on the driver heap
    conf.set("spark.sql.thriftServer.incrementalCollect", "true")
    // sweep idle sessions/operations; interval must be positive for the
    // timeouts below to fire
    conf.set("hive.server2.session.check.interval", "60000")
    conf.set("hive.server2.idle.operation.timeout",
      operationTimeoutMs.toString)
    conf.set("hive.server2.idle.session.timeout", "3600000")
    HiveThriftServer2.startWithSparkSession(ctx.spark, exitOnError = false)
  }
}
