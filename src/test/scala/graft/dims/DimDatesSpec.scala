package graft.dims

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimDatesSpec extends SparkSpec {

  test("dim_dates has 29220 distinct days from 1970-01-01 through 2049-12-31") {
    val d = DimDates.build(spark).cache()
    assert(d.count() == 29220)
    assert(d.select("id").distinct().count() == 29220)
    val bounds = d.agg(min("datum").cast("string"), max("datum").cast("string")).head()
    assert(bounds.getString(0) == "1970-01-01")
    assert(bounds.getString(1) == "2049-12-31")
  }

  test("calendar attributes match reference formulas for a leap day") {
    val row = DimDates.build(spark).where(col("id") === "20200229").head()
    assert(row.getAs[java.sql.Date]("datum").toString == "2020-02-29")
    assert(row.getAs[Int]("day_of_month") == 29)
    assert(row.getAs[Int]("day_of_year") == 60)
    assert(row.getAs[Int]("month") == 2)
    assert(row.getAs[Int]("quarter") == 1)
    assert(row.getAs[Int]("year") == 2020)
    assert(row.getAs[java.sql.Date]("first_day_of_month").toString == "2020-02-01")
    assert(row.getAs[java.sql.Date]("last_day_of_month").toString == "2020-02-29")
    assert(row.getAs[java.sql.Date]("first_day_of_next_month").toString == "2020-03-01")
  }
}
