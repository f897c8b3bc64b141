package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Shared registration path for expressions parameterized by Scala-side
  * model state (seed lists, marker tables): route through a temp
  * function so library code stays on public API, with the function name
  * encoding the FULL parameter content via md5 — a 32-bit hashCode
  * could collide across configurations and silently rebind the
  * registration under a still-lazy DataFrame.
  *
  * The registry is BOUNDED per session: content-digested names mean
  * every distinct parameterization is a distinct registration, so a
  * long-lived session calling a parameterized operator repeatedly
  * (e.g. [[graft.text.TextOps.frequentNgramsSketched]] with a fresh
  * sketch per corpus) would otherwise grow the session function
  * registry without bound. Registrations are evicted oldest-first past
  * [[maxLive]]. The window is safe because resolution is EAGER: a
  * registered name is consumed when the caller applies the returned
  * Column to a Dataset (analysis resolves `call_function` to the
  * concrete Expression at Dataset construction, not at execution), so
  * only a Column held unapplied across `maxLive` subsequent DISTINCT
  * parameterizations can observe the eviction — and that fails loudly
  * at analysis (unresolved function), never silently wrong.
  *
  * Diagnosing that failure: an analysis error naming an undefined
  * function of the form `<prefix>_<32 hex chars>` means the bounded
  * registry evicted the registration behind a Column that was held
  * unapplied while ≥ `maxLive` other DISTINCT parameterizations were
  * registered. Apply returned Columns promptly, or raise the window
  * for the session via the `spark.graft.registration.maxLive` conf
  * (read per call, so it can be raised mid-session before the burst
  * that would evict).
  */
object Registration {

  /** Default max live parameterized registrations per session;
    * override per session with the `spark.graft.registration.maxLive`
    * conf for workloads that hold unapplied Columns long-lived.
    */
  val maxLive: Int = 64

  private def maxLiveFor(spark: SparkSession): Int = {
    val raw = spark.conf.get("spark.graft.registration.maxLive", maxLive.toString)
    val v =
      try raw.trim.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"spark.graft.registration.maxLive must be an integer >= 1, got '$raw'")
      }
    require(v >= 1, s"spark.graft.registration.maxLive must be >= 1, got $v")
    v
  }

  // insertion-ordered live names per session; WeakHashMap so a dropped
  // session doesn't pin its name list (guarded by `lock` — WeakHashMap
  // is not thread-safe and Spark sessions are shared across threads)
  private val live = new java.util.WeakHashMap[SparkSession, mutable.LinkedHashSet[String]]
  private val lock = new Object

  def parameterized(
      prefix: String,
      digestSource: String,
      builder: Seq[Expression] => Expression,
      args: Column*
  )(implicit spark: SparkSession): Column = {
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(digestSource.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    val name = s"${prefix}_$digest"
    lock.synchronized {
      // content-digested name ⇒ an existing registration is
      // byte-identical in meaning; skip the replace (and its registry
      // WARN) on repeats. INSIDE the lock: checked outside it, a
      // concurrent registration could evict `name` between this check
      // and the LRU re-add below, returning a Column bound to a
      // function that no longer exists.
      if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(name)))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
      val names = {
        val n = live.get(spark)
        if (n != null) n
        else { val n2 = mutable.LinkedHashSet.empty[String]; live.put(spark, n2); n2 }
      }
      names.remove(name) // re-registration refreshes recency
      names.add(name)
      val bound = maxLiveFor(spark)
      while (names.size > bound) {
        val oldest = names.head
        names.remove(oldest)
        spark.sessionState.functionRegistry.dropFunction(FunctionIdentifier(oldest))
      }
    }
    call_function(name, args: _*)
  }
}
