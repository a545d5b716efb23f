package graft.pipeline

import graft.ops.Schemas
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed facades for the six lake outputs (SURVEY.md §1.4): `Dataset[T]`
  * views for compile-time column safety in pipeline code that consumes
  * the lake. `DataFrame` remains the currency of the parse pipelines
  * (their schemas are registry-driven); these are the read-side types.
  */
object Models {

  case class Temperature(avg_temperature: Option[Int],
                         avg_temperature_uncertainty: Option[Int],
                         country: String, year: Int, month: Int, day: Int,
                         weekday: String)

  case class Asylum(id: Long, country: String, year: Long,
                    num_arrivals: Option[Int],
                    num_accepted_affirmitavely: Option[Int],
                    num_accepted_defensively: Option[Int])

  case class TimeDim(id: Long, immigration_type: String, arrival_year: Int,
                     arrival_month: Option[Int], arrival_day: Option[Int],
                     arrival_weekday: Option[String], expiry_year: Option[Int],
                     expiry_month: Option[Int], expiry_day: Option[Int],
                     expiry_weekday: Option[String])

  case class Fact(id: Long, country: Option[String], immigration_type: String,
                  time_id: Long)

  case class Visitor(id: Int, visa_category: String, visa_type: String,
                     port_of_entry_municipality: Option[String],
                     port_of_entry_region: Option[String], country: String,
                     visiting_state: String, arrival_year: Int,
                     arrival_month: Option[Int], arrival_day: Option[Int],
                     arrival_weekday: Option[String], expiry_year: Option[Int],
                     expiry_month: Option[Int], expiry_day: Option[Int],
                     expiry_weekday: Option[String])

  case class Worker(id: Int, case_status: String, visa_type: Option[String],
                    employer_name: String, employer_city: String,
                    employer_state: String, worksite_city: String,
                    worksite_state: String, arrival_year: Int,
                    arrival_month: Option[Int], arrival_day: Option[Int],
                    arrival_weekday: Option[String], expiry_year: Option[Int],
                    expiry_month: Option[Int], expiry_day: Option[Int],
                    expiry_weekday: Option[String])

  implicit val temperatureEnc: Encoder[Temperature] = Encoders.product[Temperature]
  implicit val asylumEnc: Encoder[Asylum] = Encoders.product[Asylum]
  implicit val timeEnc: Encoder[TimeDim] = Encoders.product[TimeDim]
  implicit val factEnc: Encoder[Fact] = Encoders.product[Fact]
  implicit val visitorEnc: Encoder[Visitor] = Encoders.product[Visitor]
  implicit val workerEnc: Encoder[Worker] = Encoders.product[Worker]

  /** Typed view of a conformed frame; fails fast if the frame does not
    * carry the registry schema for the table.
    */
  def asylum(df: DataFrame): Dataset[Asylum] = typed(df, "asylum")(asylumEnc)
  def time(df: DataFrame): Dataset[TimeDim] = typed(df, "time")(timeEnc)
  def fact(df: DataFrame): Dataset[Fact] = typed(df, "fact")(factEnc)
  def temperatures(df: DataFrame): Dataset[Temperature] = typed(df, "country")(temperatureEnc)
  def visitor(df: DataFrame): Dataset[Visitor] = typed(df, "visitor")(visitorEnc)
  def worker(df: DataFrame): Dataset[Worker] = typed(df, "worker")(workerEnc)

  private def typed[T](df: DataFrame, key: String)(implicit enc: Encoder[T]): Dataset[T] = {
    val expected = Schemas.all(key).fieldNames.toSeq
    require(df.columns.toSeq == expected,
      s"not a conformed '$key' frame: ${df.columns.toSeq} vs $expected")
    df.as[T]
  }
}
