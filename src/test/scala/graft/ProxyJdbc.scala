package graft

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy => JProxy}
import java.sql.{BatchUpdateException, Connection, PreparedStatement, SQLTransactionRollbackException, Statement}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** A delegating JDBC driver that presents a DIFFERENT driver's batch
  * semantics over an embedded Derby database.
  *
  * Why: this environment ships exactly one database engine (Derby), and
  * Derby's batches return REAL update counts and rarely deadlock a
  * single-writer test — so three dialect-divergent branches of the keyed
  * sinks never execute under the plain Derby matrix:
  *
  *  - SUCCESS_NO_INFO (−2) from every UPDATE batch entry (PostgreSQL's
  *    batched mode, Oracle JDBC batching): the sink must fall back to the
  *    per-key existence probe for every row instead of trusting counts;
  *  - EXECUTE_FAILED (−3) entries (MySQL-style continue-on-error
  *    batches): the sink must FAIL the partition transaction — probing a
  *    failed entry would silently drop that row's change;
  *  - deadlock-victim rollback (SQLState 40001 wrapped in a
  *    BatchUpdateException, as real drivers deliver it): the sink must
  *    roll back, back off, and replay the buffered partition EXACTLY.
  *
  * The proxy rewrites `jdbc:graftproxy:<db>` to `jdbc:derby:<db>`, passes
  * everything through, and only rewrites the RESULT of
  * `PreparedStatement.executeBatch` on UPDATE statements (plus optional
  * injected deadlocks) — the data path underneath is the real database,
  * so the specs assert end-state correctness, not mock bookkeeping.
  */
object ProxyJdbc {
  /** Every UPDATE batch reports SUCCESS_NO_INFO for every entry. */
  @volatile var noInfo: Boolean = false
  /** The next UPDATE batch reports EXECUTE_FAILED for its last entry. */
  @volatile var failLastEntryOnce: Boolean = false
  /** Inject this many deadlock-victim failures onto UPDATE batches. */
  val deadlocksToInject = new AtomicInteger(0)
  /** Observed UPDATE executeBatch invocations (replays visible here). */
  val updateBatches = new AtomicInteger(0)
  /** Observed `SELECT 1 FROM ...` existence probes prepared. */
  val existsProbes = new AtomicInteger(0)

  def reset(): Unit = {
    noInfo = false
    failLastEntryOnce = false
    deadlocksToInject.set(0)
    updateBatches.set(0)
    existsProbes.set(0)
  }

  private val registered = new AtomicBoolean(false)
  def install(): Unit = if (registered.compareAndSet(false, true))
    java.sql.DriverManager.registerDriver(new ProxyJdbcDriver)

  private[graft] def wrapConnection(real: Connection): Connection =
    proxy(classOf[Connection], real) { (method, args) =>
      method.getName match {
        case "prepareStatement" =>
          val sql = args(0).asInstanceOf[String]
          if (sql.regionMatches(true, 0, "SELECT 1 FROM", 0, 13))
            existsProbes.incrementAndGet()
          val st = method.invoke(real, args: _*).asInstanceOf[PreparedStatement]
          if (sql.regionMatches(true, 0, "UPDATE", 0, 6)) wrapUpdate(st) else st
        case _ => method.invoke(real, args: _*)
      }
    }

  private def wrapUpdate(real: PreparedStatement): PreparedStatement =
    proxy(classOf[PreparedStatement], real) { (method, args) =>
      if (method.getName == "executeBatch") {
        // the REAL batch executes first; autocommit is off in the sinks,
        // so an injected failure still lets conn.rollback() undo it —
        // exactly the state a real deadlock victim sees
        val counts = method.invoke(real, args: _*).asInstanceOf[Array[Int]]
        updateBatches.incrementAndGet()
        if (deadlocksToInject.getAndUpdate(n => math.max(0, n - 1)) > 0)
          throw new BatchUpdateException("injected deadlock victim", "40001",
            0, new Array[Int](0),
            new SQLTransactionRollbackException("deadlock victim", "40001"))
        if (failLastEntryOnce && counts.nonEmpty) {
          failLastEntryOnce = false
          counts(counts.length - 1) = Statement.EXECUTE_FAILED
          counts
        } else if (noInfo) counts.map(_ => Statement.SUCCESS_NO_INFO)
        else counts
      } else method.invoke(real, args: _*)
    }

  private def proxy[T](iface: Class[T], real: AnyRef)(
      h: (Method, Array[AnyRef]) => AnyRef): T =
    JProxy.newProxyInstance(iface.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef =
          try h(m, if (a == null) Array.empty[AnyRef] else a)
          catch { case e: InvocationTargetException => throw e.getCause }
      }).asInstanceOf[T]
}

class ProxyJdbcDriver extends java.sql.Driver {
  private val inner = new org.apache.derby.jdbc.EmbeddedDriver
  private val Prefix = "jdbc:graftproxy:"
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)
  override def connect(url: String,
                       info: java.util.Properties): Connection = {
    if (!acceptsURL(url)) return null
    val real = inner.connect("jdbc:derby:" + url.substring(Prefix.length), info)
    if (real == null) null else ProxyJdbc.wrapConnection(real)
  }
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
