package graft.faers.gold

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Type-1 calendar dimension (reference: src/gold/dims/dim_date.py:20-161):
  * a generated date spine decorated with calendar, fiscal, seasonal,
  * relative (clock-dependent) and FAERS reporting-period attributes.
  *
  * The relative columns (`days_from_today`, `is_past/is_future/is_today`)
  * take an injectable `today` so golden tests are stable (SURVEY.md §7.5);
  * production passes None → real `current_date`.
  *
  * Scale: ~11k rows for 2000-2030 — always broadcast in fact joins.
  */
object DimDate {

  def create(spark: SparkSession,
             startDate: String = "2000-01-01",
             endDate: String = "2030-12-31",
             today: Option[Date] = None): DataFrame = {
    val todayCol = today.map(lit(_)).getOrElse(current_date())
    val spine = spark.range(1).select(
      explode(sequence(
        to_date(lit(startDate)), to_date(lit(endDate)),
        expr("interval 1 day"))).as("date_value"))

    spine.select(
        col("date_value").as("date_key"),
        col("date_value"),
        year(col("date_value")).as("year"),
        month(col("date_value")).as("month"),
        dayofmonth(col("date_value")).as("day"),
        quarter(col("date_value")).as("quarter"),
        weekofyear(col("date_value")).as("week_of_year"),
        dayofweek(col("date_value")).as("day_of_week"), // 1=Sunday, 7=Saturday
        dayofyear(col("date_value")).as("day_of_year"),
        date_format(col("date_value"), "yyyy-MM-dd").as("date_string"),
        date_format(col("date_value"), "yyyyMMdd").as("date_string_compact"),
        date_format(col("date_value"), "MMMM").as("month_name"),
        date_format(col("date_value"), "MMM").as("month_short_name"),
        date_format(col("date_value"), "EEEE").as("day_name"),
        date_format(col("date_value"), "EEE").as("day_short_name"),
        concat(year(col("date_value")), lit("-Q"), quarter(col("date_value"))).as("year_quarter"),
        concat(year(col("date_value")), lit("-"),
          lpad(month(col("date_value")), 2, "0")).as("year_month"),
        concat(year(col("date_value")), lit("-W"),
          lpad(weekofyear(col("date_value")), 2, "0")).as("year_week"),
        dayofweek(col("date_value")).isin(1, 7).as("is_weekend"),
        dayofweek(col("date_value")).between(2, 6).as("is_weekday"),
        (dayofmonth(col("date_value")) === 1).as("is_first_day_of_month"),
        (dayofmonth(col("date_value")) === dayofmonth(last_day(col("date_value"))))
          .as("is_last_day_of_month"),
        (dayofyear(col("date_value")) === 1).as("is_first_day_of_year"),
        (month(col("date_value")) === 12 && dayofmonth(col("date_value")) === 31)
          .as("is_last_day_of_year"),
        current_timestamp().as("created_ts"),
        current_date().as("created_date"))
      .withColumn("season",
        when(col("month").isin(12, 1, 2), "Winter")
          .when(col("month").isin(3, 4, 5), "Spring")
          .when(col("month").isin(6, 7, 8), "Summer")
          .otherwise("Fall"))
      .withColumn("fiscal_year",
        when(col("month") >= 7, col("year") + 1).otherwise(col("year")))
      .withColumn("fiscal_quarter",
        when(col("month").between(7, 9), 1)
          .when(col("month").between(10, 12), 2)
          .when(col("month").between(1, 3), 3)
          .otherwise(4))
      .withColumn("days_from_today", datediff(col("date_value"), todayCol))
      .withColumn("is_past", col("date_value") < todayCol)
      .withColumn("is_future", col("date_value") > todayCol)
      .withColumn("is_today", col("date_value") === todayCol)
      .withColumn("reporting_period",
        when(col("year") < 2010, "Pre-2010")
          .when(col("year").between(2010, 2015), "2010-2015")
          .when(col("year").between(2016, 2020), "2016-2020")
          .when(col("year") >= 2021, "2021+")
          .otherwise("Unknown"))
  }

  /** Read helpers implied by the reference API (dim_date.py:190-212). */
  def datesInRange(dimDate: DataFrame, start: String, end: String): DataFrame =
    dimDate.filter(col("date_key") >= start && col("date_key") <= end)

  def businessDays(dimDate: DataFrame, start: String, end: String): DataFrame =
    datesInRange(dimDate, start, end).filter(col("is_weekday"))
}
