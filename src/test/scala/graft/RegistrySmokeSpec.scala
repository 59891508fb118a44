package graft

/** Every registry query must build a plan and execute at sf0.001, and
  * names/oracles must satisfy the driver contract.
  */
class RegistrySmokeSpec extends SparkSpec {

  test("registry names are unique and oracle keys ⊆ query keys") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"dup names: ${names.diff(names.distinct)}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      // Driver-gate shape contract: the oracle compare hashes scalar
      // cells only — an array/map/struct output column makes the gate
      // unrunnable (round-6 ext_rproj failure mode). Catch it here.
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val nonScalar = df.schema.fields.filter { f =>
        f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        }
      }
      assert(nonScalar.isEmpty,
        s"non-scalar output columns break the driver's hasher: " +
          nonScalar.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      df.count() // force full execution
    }
  }
}
