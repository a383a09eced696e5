package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Declarative dataset registry — the engine's analog of the reference's
  * `@dp.table(name, comment)` + `dp.read(name)` model
  * (silver_layer_person.py:4-8, :18-19): datasets are named builders,
  * dependency edges are declared, and materialization runs in
  * topological order. On a cluster each independent subtree can
  * materialize concurrently (the reference's 68 bronze tables are all
  * independent and run in parallel, bronze_structure.ipynb:93-102).
  */
final case class TableDef(
    name: String,
    comment: String,
    deps: Seq[String],
    build: (SparkSession, String => DataFrame) => DataFrame)

final class Registry {
  private val defs = mutable.LinkedHashMap.empty[String, TableDef]

  def register(t: TableDef): Unit = {
    require(!defs.contains(t.name), s"duplicate table def: ${t.name}")
    defs(t.name) = t
  }

  def tableNames: Seq[String] = defs.keys.toSeq

  /** Kahn topological order; fails on cycles or missing deps.
    * External inputs (names in `external`) are allowed as leaves. */
  def topoOrder(external: Set[String] = Set.empty): Seq[String] = {
    val indeg = mutable.Map.empty[String, Int]
    val out = mutable.Map.empty[String, mutable.Buffer[String]]
    defs.values.foreach { t =>
      indeg.getOrElseUpdate(t.name, 0)
      t.deps.foreach { d =>
        if (!external.contains(d)) {
          require(defs.contains(d), s"${t.name} depends on unknown table $d")
          out.getOrElseUpdate(d, mutable.Buffer.empty) += t.name
          indeg(t.name) = indeg.getOrElse(t.name, 0) + 1
        }
      }
    }
    val queue = mutable.Queue(defs.keys.filter(k => indeg(k) == 0).toSeq: _*)
    val order = mutable.Buffer.empty[String]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      order += n
      out.getOrElse(n, Nil).foreach { m =>
        indeg(m) -= 1
        if (indeg(m) == 0) queue.enqueue(m)
      }
    }
    require(order.size == defs.size, s"dependency cycle among: ${defs.keySet -- order}")
    order.toSeq
  }

  /** Materializes every dataset in dependency order. `resolve` serves
    * external (source) tables; registry outputs are memoized so shared
    * upstreams build once — the `dp.read` batch-edge semantics. */
  def materializeAll(
      spark: SparkSession,
      resolve: String => DataFrame): Map[String, DataFrame] = {
    val built = mutable.Map.empty[String, DataFrame]
    def lookup(name: String): DataFrame = built.getOrElse(name, resolve(name))
    topoOrder(external = Set.empty ++ collectExternal).foreach { n =>
      built(n) = defs(n).build(spark, lookup)
    }
    built.toMap
  }

  private def collectExternal: Set[String] =
    defs.values.flatMap(_.deps).filterNot(defs.contains).toSet

  /** The `@dp.table` materialization sink: builds every dataset in
    * dependency order and persists each as parquet under
    * `outDir/<schema>/<table>` (dots → path segments). Returns
    * name → path. Batch analog of the streaming parquet+checkpoint
    * sink; on a cluster independent subtrees write concurrently. */
  def materializeToDir(
      spark: SparkSession,
      resolve: String => DataFrame,
      outDir: String): Map[String, String] =
    materializeAll(spark, resolve).map { case (name, df) =>
      val path = s"$outDir/${name.replace('.', '/')}"
      df.write.mode("overwrite").parquet(path)
      name -> path
    }
}

object Registry {

  /** Bronze fan-out generator — the reference's factory loop creating
    * one passthrough staging table per (schema, table) pair
    * (bronze_structure.ipynb:47-102). */
  def bronzeFanOut(reg: Registry, schemas: Map[String, Seq[String]]): Unit =
    for ((schema, tables) <- schemas.toSeq.sortBy(_._1); t <- tables.sorted) {
      val src = s"src_$schema.$t"
      reg.register(TableDef(
        name = s"stg_$schema.stg_$t",
        comment = s"1:1 staging passthrough of $src",
        deps = Seq(src),
        build = (_, read) => read(src)))
    }
}
