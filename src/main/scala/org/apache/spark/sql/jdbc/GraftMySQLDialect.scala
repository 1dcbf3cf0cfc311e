package org.apache.spark.sql.jdbc

/** MySQL dialect with the reference's C2 guard made pushable.
  *
  * The reference inlines its non-empty-name guard into the SQL text it
  * sends to MySQL (`length(x) > 0`, cnics_to_fhir.py:127,139,155).
  * Spark ships `length()` to V2 pushdown as the canonical function name
  * CHAR_LENGTH, which the stock MySQL dialect refuses to compile (its
  * supported-function list excludes it) even though MySQL supports
  * CHAR_LENGTH natively — so the one guard the reference pushes
  * remotely would evaluate post-scan in Spark (round-10 verdict #3).
  *
  * This subclass whitelists CHAR_LENGTH (and its canonical alias
  * CHARACTER_LENGTH) on top of the stock list; the inherited
  * MySQLSQLBuilder renders the call verbatim — `CHAR_LENGTH(`col`) > 0`
  * is valid MySQL. Every other behavior (type mapping, quoting, limit
  * clauses, the query builder, the other predicate translations) is
  * inherited untouched, which is exactly why this lives in Spark's
  * dialect package: MySQLDialect is `private[sql]` at the Scala level,
  * and a composition-based wrapper could not even override the
  * private[sql]-typed surface (getJdbcSQLQueryBuilder) it must keep.
  *
  * Registration replaces the stock entry: JdbcDialects.registerDialect
  * prepends and drops `==`-equal dialects, and MySQLDialect's case-class
  * equality (arity 0, canEqual by isInstanceOf) makes this subclass
  * equal to the stock instance — so `jdbc:mysql:` URLs resolve to
  * exactly one dialect, never the AggregatedDialect fallback (which
  * would LOSE expression compilation entirely).
  */
private[jdbc] class GraftMySQLDialectImpl extends MySQLDialect {
  override def isSupportedFunction(funcName: String): Boolean =
    funcName == "CHAR_LENGTH" || funcName == "CHARACTER_LENGTH" ||
      super.isSupportedFunction(funcName)
}

object GraftMySQLDialect {
  private lazy val registered: Unit =
    JdbcDialects.registerDialect(new GraftMySQLDialectImpl)

  /** Idempotent; call before any `jdbc:mysql:` read. */
  def ensureRegistered(): Unit = registered

  /** True iff `d` is this extension's dialect (MySQLDialect is
    * package-private, so callers can't type-test it themselves). */
  def isOurs(d: JdbcDialect): Boolean = d.isInstanceOf[GraftMySQLDialectImpl]

  /** The stock dialect, for tests pinning what the whitelist adds. */
  def stock: JdbcDialect = MySQLDialect()
}
