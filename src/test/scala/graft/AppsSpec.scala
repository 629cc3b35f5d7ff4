package graft

/** Every assembled reference-app equivalent runs end-to-end on the test
  * data and produces rows with a stable schema. */
class AppsSpec extends GraftSuite {

  apps.Apps.all.foreach { case (name, fn) =>
    test(s"app $name runs and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
