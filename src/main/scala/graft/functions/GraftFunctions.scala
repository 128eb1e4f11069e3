package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftshim.Bridge

/** Session-level registration of graft's native SQL functions, so the
  * dialect-paired SQL fragments (see [[SqlDialect]]) can call them by
  * name from `expr(...)` strings. Idempotent per session.
  */
object GraftFunctions {

  private val done = ConcurrentHashMap.newKeySet[SparkSession]()

  def ensureRegistered(spark: SparkSession): Unit = {
    if (done.add(spark)) {
      Bridge.registerFunction(spark, "portable_hash64",
        args => PortableHash64(args.head))
      Bridge.registerFunction(spark, "portable_md5_lanes",
        args => PortableMd5Lanes(args.head))
    }
  }
}
