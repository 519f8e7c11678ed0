package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, element_at, transform}

/** Column-expression helpers shared across the ops layer. */
object Cols {

  /** Let-binding for Column trees: evaluate `e` ONCE per row, expose it
    * to `f` as a higher-order-function lambda variable.
    *
    * Column expressions have no native let, so a subtree referenced n
    * times is INLINED n times. Top-level projections get whole-stage
    * codegen's common-subexpression elimination, but HOF lambdas are
    * interpreted and get NO cross-lambda CSE — an expensive subtree
    * referenced inside `transform`/`filter`/`aggregate` re-evaluates per
    * element. Round-11 probe: the un-bound portable MinHash signature
    * re-tokenized + re-md5'd every doc once per permutation × per
    * shingle (5k docs did not finish in 5 min; bound form ~6 s cold).
    *
    * `element_at(transform(array(e), v => f(v)), 1)` is the binding:
    * the single-element array materializes `e`, the lambda body sees it
    * as a variable reference.
    */
  def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), v => f(v)), 1)
}
