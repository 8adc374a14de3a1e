package graft.sql

/** ANSI-SQL query builder — re-expression of the reference `Connector`'s
  * string builder (`/root/reference/ingestion/connector/pg_connect.py:
  * 97-203`): SELECT column-list / WHERE / ORDER BY / LIMIT / OFFSET /
  * INSERT / UPDATE / DELETE / CREATE / TRUNCATE / DROP.
  *
  * Differences from the reference, on purpose (SURVEY §7.4 risk 2):
  *  - emits ANSI SQL (runs on Spark SQL and DuckDB alike), not psycopg2
  *    placeholders;
  *  - identifiers are validated (`[A-Za-z_][A-Za-z0-9_.]*`) instead of
  *    interpolated blind;
  *  - no `retrieve` tail-slice quirk (`pg_connect.py:286`), no always-true
  *    `return_type` check (`pg_connect.py:224`).
  */
object QueryBuilder {

  private val Ident = "^[A-Za-z_][A-Za-z0-9_.]*$".r

  def ident(s: String): String = s match {
    case Ident() => s
    case other => throw new IllegalArgumentException(
      s"invalid SQL identifier: '$other'")
  }

  /** Column list — `cols="all"` → `*`, else comma-join
    * (`pg_connect.py:164-183`). */
  def columnList(cols: Seq[String]): String =
    if (cols.isEmpty) "*" else cols.map(ident).mkString(", ")

  final case class Select(
      table: String,
      cols: Seq[String] = Nil,
      where: Option[String] = None,
      orderBy: Seq[(String, Boolean)] = Nil,  // (col, ascending)
      limit: Option[Long] = None,
      offset: Option[Long] = None) {
    def sql: String = {
      val sb = new StringBuilder(s"SELECT ${columnList(cols)} FROM ${ident(table)}")
      where.foreach(w => sb ++= s" WHERE $w")                    // pg_connect.py:114-121
      if (orderBy.nonEmpty) sb ++= orderBy                        // pg_connect.py:123-134
        .map { case (c, asc) => s"${ident(c)} ${if (asc) "ASC" else "DESC"}" }
        .mkString(" ORDER BY ", ", ", "")
      limit.foreach(n => sb ++= s" LIMIT $n")                     // pg_connect.py:136-143
      offset.foreach(n => sb ++= s" OFFSET $n")                   // pg_connect.py:145-152
      sb.result()
    }
  }

  /** RETURNING suffix — `pg_connect.py:154-162`. PostgreSQL-flavored (the
    * reference control store); empty list → no clause. */
  def returningClause(cols: Seq[String]): String =
    if (cols.isEmpty) ""
    else cols.map(ident).mkString(" RETURNING ", ", ", "")

  /** INSERT — `pg_connect.py:330-338`. Values must be pre-rendered SQL
    * literals (use [[lit]]). */
  def insert(table: String, row: Seq[(String, String)],
      returning: Seq[String] = Nil): String =
    s"INSERT INTO ${ident(table)} (${row.map(r => ident(r._1)).mkString(", ")}) " +
      s"VALUES (${row.map(_._2).mkString(", ")})" + returningClause(returning)

  /** Multi-row INSERT in one statement — the reference's `insert_many`
    * via psycopg2 `execute_values` (`pg_connect.py:340-363`). All rows
    * must share the first row's column set. */
  def insertMany(table: String, rows: Seq[Seq[(String, String)]]): String = {
    require(rows.nonEmpty, "insertMany needs at least one row")
    val cols = rows.head.map(_._1)
    require(rows.forall(_.map(_._1) == cols),
      "insertMany rows must share one column set")
    s"INSERT INTO ${ident(table)} (${cols.map(ident).mkString(", ")}) VALUES " +
      rows.map(_.map(_._2).mkString("(", ", ", ")")).mkString(", ")
  }

  /** UPDATE ... SET ... WHERE [RETURNING] — `pg_connect.py:365-384`. */
  def update(table: String, set: Seq[(String, String)], where: String,
      returning: Seq[String] = Nil): String =
    s"UPDATE ${ident(table)} SET " +
      set.map { case (c, v) => s"${ident(c)} = $v" }.mkString(", ") +
      s" WHERE $where" + returningClause(returning)

  /** DELETE ... WHERE [RETURNING] — `pg_connect.py:386-395`. */
  def delete(table: String, where: String,
      returning: Seq[String] = Nil): String =
    s"DELETE FROM ${ident(table)} WHERE $where" + returningClause(returning)

  /** CREATE TABLE — `pg_connect.py:237-243`. */
  def create(table: String, schema: String): String =
    s"CREATE TABLE ${ident(table)} ($schema)"

  def truncate(table: String): String = s"TRUNCATE TABLE ${ident(table)}"

  def drop(table: String): String = s"DROP TABLE IF EXISTS ${ident(table)}"

  /** SQL string literal with quote-doubling. */
  def lit(v: Any): String = v match {
    case null                   => "NULL"
    case None                   => "NULL"
    case Some(x)                => lit(x)
    case n: Int                 => n.toString
    case n: Long                => n.toString
    case n: Double              => n.toString
    case b: Boolean             => if (b) "TRUE" else "FALSE"
    case t: java.sql.Timestamp  => s"TIMESTAMP '${t.toString.stripSuffix(".0")}'"
    case s: String              => "'" + s.replace("'", "''") + "'"
    case other                  => lit(other.toString)
  }
}
