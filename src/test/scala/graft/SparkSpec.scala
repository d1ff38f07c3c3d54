package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session, scalatest reuses). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sql(q: String) = spark.sql(q)
}

object SparkSpec {
  lazy val session: SparkSession =
    graft.core.GraftSession.local(cpus = 4)
}
