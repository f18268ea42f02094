package graft.dq

import org.apache.spark.sql.types.{NumericType, StructType}

/**
 * Generated SQL test cases from table metadata — the Spark-native
 * re-expression of the reference's mapping-driven generator
 * (ref: tools/sql_test_case_generator.py:25-257): for each table it emits
 *  - a row-count probe,
 *  - a TRIMmed composite-PK duplicate check,
 *  - SUM reconciliation for amount-like numeric columns (`*amt*`/`*price*`),
 *  - COUNT + GROUP BY distribution for low-cardinality text columns,
 * optionally windowed by a recency filter (the reference's 7-day clause).
 */
object TestCaseGenerator {

  final case class GeneratedCase(name: String, sql: String)

  def generate(
      table: String,
      schema: StructType,
      pkColumns: Seq[String],
      groupByColumns: Seq[String] = Seq.empty,
      recencyFilter: Option[String] = None): Seq[GeneratedCase] = {
    val where = recencyFilter.map(f => s" WHERE $f").getOrElse("")

    val rowCount = GeneratedCase(s"${table}_row_count",
      s"SELECT COUNT(*) AS row_count FROM $table$where")

    val dupPk = if (pkColumns.nonEmpty) {
      val keys = pkColumns.map(c => s"TRIM(CAST($c AS STRING)) AS $c").mkString(", ")
      val grp = (1 to pkColumns.length).mkString(", ")
      Seq(GeneratedCase(s"${table}_duplicate_pk",
        s"SELECT $keys, COUNT(*) AS err_count FROM $table$where GROUP BY $grp HAVING COUNT(*) > 1"))
    } else Seq.empty

    val amountSums = schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] &&
        (f.name.toLowerCase.contains("amt") || f.name.toLowerCase.contains("price")) =>
        GeneratedCase(s"${table}_sum_${f.name}",
          s"SELECT CAST(SUM(CAST(${f.name} AS DECIMAL(18,2))) AS DOUBLE) AS total FROM $table$where")
    }.toSeq

    val distributions = groupByColumns.map(c =>
      GeneratedCase(s"${table}_dist_$c",
        s"SELECT $c, COUNT(*) AS n FROM $table$where GROUP BY $c"))

    Seq(rowCount) ++ dupPk ++ amountSums ++ distributions
  }
}
