package graft.operators

import graft.model.TrendStorePart
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Generated trends: computed columns declared in the instance model as SQL
  * expressions (reference: PostgreSQL `GENERATED ALWAYS AS`,
  * src/minerva/instance/__init__.py:102-162). Applied at read (view-style),
  * which keeps them inside Catalyst — constant folding and pushdown see
  * through them. */
object GeneratedTrends {
  def apply(df: DataFrame, part: TrendStorePart): DataFrame =
    part.generatedTrends.foldLeft(df)((d, g) =>
      d.withColumn(g.name, expr(g.expression).cast(g.dataType.sparkType)))
}
