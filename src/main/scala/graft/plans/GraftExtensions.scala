package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{DotProductDouble, Md5Halves}

/** SparkSessionExtensions entry point: registers the native expressions as
  * SQL functions so pure-SQL users get the same codegen'd hot path.
  *
  * Wire up with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes exactly 2 array<double> arguments")
        DotProductDouble(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_halves"),
      new ExpressionInfo(classOf[Md5Halves].getName, "graft_md5_halves"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "graft_md5_halves(s) takes exactly 1 string argument")
        Md5Halves(children.head)
      }))
  }
}
