package graft.schema

import scala.collection.immutable.ListMap
import org.apache.spark.sql.types._

/** Canonical + physical schemas and the two column-name maps of the engine.
  *
  * Mirrors the reference's data model (see SURVEY.md §1):
  *  - source→canonical map: reference `src/utils/constants.py:6-36`
  *  - mandatory/optional split: `constants.py:39-54`
  *  - canonical→physical (warehouse) map: `constants.py:57-68`
  *  - physical DDL: `scripts/ddl/create_intermediate_table.sql:7-41`
  *
  * Order matters: [[ColumnMappings.columnMap]] is a [[ListMap]] because the
  * reference coalesces duplicate-target source columns in *map insertion
  * order* (`data_validator.py:76-82` iterates `COLUMN_MAP.items()`), not in
  * source-frame column order.
  */
object ColumnMappings {

  /** Source spelling → canonical name (reference `constants.py:6-36`).
    * Python dict semantics: a repeated key keeps its first position, so the
    * duplicated `VaccinationType`/`VaccinationDate` entries collapse to one.
    */
  val columnMap: ListMap[String, String] = ListMap(
    "ID" -> "Customer_Id",
    "Name" -> "Customer_Name",
    "VaccinationType" -> "Vaccination_Id",
    "VaccinationDate" -> "Open_Date",
    "Unique ID" -> "Customer_Id",
    "Patient Name" -> "Customer_Name",
    "Vaccine Type" -> "Vaccination_Id",
    "Date of Birth" -> "DOB",
    "Date of Vaccination" -> "Open_Date",
    "DOB" -> "DOB",
    "Doctor Name" -> "Dr_Name",
    "Doctor" -> "Dr_Name",
    "State/Province" -> "State",
    "State" -> "State",
    "Country Name" -> "Country",
    "Country" -> "Country",
    "Consultation Date" -> "Last_Consulted_Date",
    "Last Consulted Date" -> "Last_Consulted_Date",
    "Postal Code" -> "Post_Code",
    "Post Code" -> "Post_Code",
  )

  /** reference `constants.py:39-43` */
  val mandatoryColumns: Seq[String] = Seq("Customer_Name", "Customer_Id", "Open_Date")

  /** reference `constants.py:46-54` */
  val optionalColumns: Seq[String] = Seq(
    "Last_Consulted_Date", "Vaccination_Id", "Dr_Name", "State", "Country",
    "Post_Code", "DOB")

  /** Canonical → physical warehouse name (reference `constants.py:57-68`).
    * Names not present here pass through unchanged. */
  val warehouseColumnMap: ListMap[String, String] = ListMap(
    "Customer_Name" -> "Name",
    "Customer_Id" -> "Cust_I",
    "Open_Date" -> "Open_Dt",
    "Last_Consulted_Date" -> "Consul_Dt",
    "Vaccination_Id" -> "VAC_ID",
    "Dr_Name" -> "DR_Name",
    "State" -> "State",
    "Country" -> "Country",
    "DOB" -> "DOB",
    "Is_Active" -> "FLAG",
  )
}

object Schemas {

  /** The 8 canonical columns kept as strings (reference `data_validator.py:129-132`). */
  val stringColumns: Seq[String] = Seq(
    "Customer_Name", "Customer_Id", "Vaccination_Id", "Dr_Name", "State",
    "Country", "Post_Code", "Is_Active")

  /** Date columns that quarantine the row when invalid (`data_validator.py:135`). */
  val mandatoryDateColumns: Seq[String] = Seq("Open_Date")

  /** Date columns that only null out when invalid (`data_validator.py:138`). */
  val optionalDateColumns: Seq[String] = Seq("Last_Consulted_Date", "DOB")

  val dateColumns: Seq[String] = mandatoryDateColumns ++ optionalDateColumns

  /** All 11 canonical columns in a stable output order: the 10 fields of the
    * reference's expected header (`data_validator.py:34`) + `Post_Code`
    * (string-typed and optional per `constants.py:46-54`, absent from the
    * header constant). Strings at the harmonization stage; dates are typed by
    * the validator. */
  val canonicalColumns: Seq[String] = Seq(
    "Customer_Name", "Customer_Id", "Open_Date", "Last_Consulted_Date",
    "Vaccination_Id", "Dr_Name", "State", "Country", "DOB", "Post_Code",
    "Is_Active")

  /** Post-harmonization schema: everything still a nullable string — the
    * reference keeps dates as strings until the warehouse write
    * (`snowflake_connector.py:282-287`); the rebuild types them at the
    * validation stage instead. */
  val canonicalRawSchema: StructType =
    StructType(canonicalColumns.map(StructField(_, StringType, nullable = true)))

  /** Validated canonical schema: date columns typed (parse-once-at-ingest,
    * SURVEY.md §1.2). */
  val canonicalSchema: StructType = StructType(canonicalColumns.map { c =>
    val t = if (dateColumns.contains(c)) DateType else StringType
    StructField(c, t, nullable = true)
  })

  /** Physical warehouse schema, mirroring the DDL
    * (`create_intermediate_table.sql:7-41`) after the connector's
    * uppercase/underscore name normalization (`snowflake_connector.py:203`):
    * business columns + `LOAD_DATE` (S10) + `SOURCE_FILE` (S9). */
  val warehouseSchema: StructType = StructType(Seq(
    StructField("CUST_I", StringType, nullable = false),
    StructField("NAME", StringType, nullable = false),
    StructField("OPEN_DT", DateType, nullable = false),
    StructField("CONSUL_DT", DateType, nullable = true),
    StructField("VAC_ID", StringType, nullable = true),
    StructField("DR_NAME", StringType, nullable = true),
    StructField("STATE", StringType, nullable = true),
    StructField("COUNTRY", StringType, nullable = true),
    StructField("DOB", DateType, nullable = true),
    StructField("POST_CODE", StringType, nullable = true),
    StructField("FLAG", StringType, nullable = true),
    StructField("LOAD_DATE", TimestampType, nullable = true),
    StructField("SOURCE_FILE", StringType, nullable = true),
  ))

  /** Quarantine schema = canonical raw columns + error annotation
    * (`data_validator.py:160-167`). */
  val quarantineSchema: StructType = StructType(
    canonicalRawSchema.fields ++ Seq(
      StructField("Validation_Error", StringType, nullable = true),
      StructField("Invalid_Field", StringType, nullable = true)))

  /** The reference's embedded-header sentinel (`data_validator.py:34`). */
  val expectedHeader: String =
    "|H|Customer_Name|Customer_Id|Open_Date|Last_Consulted_Date|Vaccination_Id|Dr_Name|State|Country|DOB|Is_Active"
}

/** Typed view of one validated record, exposed at the API boundary
  * (SURVEY.md §1.4). Nullability of the Option fields is the core business
  * rule (`data_validator.py:267-281`). */
case class VaccinationRecord(
    Customer_Name: String,
    Customer_Id: String,
    Open_Date: java.sql.Date,
    Last_Consulted_Date: Option[java.sql.Date],
    Vaccination_Id: Option[String],
    Dr_Name: Option[String],
    State: Option[String],
    Country: Option[String],
    DOB: Option[java.sql.Date],
    Post_Code: Option[String],
    Is_Active: Option[String])
