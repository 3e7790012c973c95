package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the warehouse tables (S6) — re-expression of
  * the reference DDL (`sql/redshift_table_schemas.sql:31-274` in
  * bill-hoerr/automotive-data-pipeline-demo).
  *
  * Type mapping (SURVEY.md §1.2): varchar/text → StringType (no length
  * enforcement), numeric(p,s) → DecimalType(p,s) (money stays decimal),
  * timestamp without tz → TimestampType (session pinned UTC),
  * date → DateType, time → StringType (no Spark TIME), boolean →
  * BooleanType. Column encodings (lzo/az64/…) and SORTKEYs are storage
  * concerns: Parquet dictionary/RLE is automatic, and writers can
  * `sortWithinPartitions` to emulate sort keys (see etl.LakeWriter).
  */
object Schemas {

  private def s(n: String) = StructField(n, StringType)
  private def d182(n: String) = StructField(n, DecimalType(18, 2))
  private def d180(n: String) = StructField(n, DecimalType(18, 0))
  private def d82(n: String) = StructField(n, DecimalType(8, 2))
  private def ts(n: String) = StructField(n, TimestampType)
  private def dt(n: String) = StructField(n, DateType)
  private def b(n: String) = StructField(n, BooleanType)

  /** `source_data.vehicle_sales` (`redshift_table_schemas.sql:31-115`). */
  val vehicleSales: StructType = StructType(Seq(
    s("dealno"), s("branch"),
    s("custno"), s("email1"), s("homephone"), s("address"), s("city"),
    s("state"), s("ziporpostalcode"),
    s("vin"), s("stockno"), s("year"), s("makename"), s("modelname"),
    s("bodystyle"), s("color"), d182("vehiclemileage"), s("modeltype"),
    s("saletype"), s("dealtype"), s("fidealtype"),
    d182("cashprice"), d182("costprice"), d182("outthedoorprice"),
    d182("totalgross"), d182("frontgross"), d182("backgross"), d182("grossprofit"),
    d182("customercashdown"), d182("totaldown"),
    s("financesource"), d182("financeamt"), d182("apr"), d180("term"),
    d182("paymentamt"), d180("payments"),
    s("trade1vin"), d182("trade1acv"), d182("trade1payoff"), s("trade1year"),
    s("trade1makename"), s("trade1modelname"), d182("trade1mileage"),
    d182("nettrade1"), d182("totaltradeallowance"),
    s("leasetype"), d182("leasepayment"), d182("leasemileageallowance"),
    d182("leaseendvalue"),
    d182("warrantyfee"), s("mbicarrier"),
    s("crmsalesmgrname"), s("crmsp1name"),
    ts("salesdate"), ts("contractdate"), ts("rowlastupdatedutc"),
    s("accountingaccount"), s("cora_acct_code"), d182("weowesaletotal")))

  /** `source_data.customer_master` (`redshift_table_schemas.sql:129-221`). */
  val customerMaster: StructType = StructType(Seq(
    s("custno"), s("hostitemid"),
    s("firstname"), s("lastname"), s("middlename"), s("namesuffix"),
    s("namecompany"), s("gender"), dt("birthdate"),
    s("email"), s("telephone"), s("homephone"), s("businessphone"),
    s("cellular"), s("address"), s("addresssecondline"), s("city"),
    s("state"), s("ziporpostalcode"), s("county"), s("country"),
    s("contactmethod"), s("preferredlanguage"),
    b("blockdatashare"), b("blockemail"), b("blockemailnational"),
    b("blockmail"), b("blockmailnational"), b("blockphone"),
    b("optoutflag"), dt("optoutdate"), s("optouttime"),
    b("deletedataflag"), dt("deletedatadate"), s("deletedatatime"),
    s("employer"), s("saletype"), b("servicecustomer"),
    d182("creditlimit"), d182("currentdue"), d182("lastpayamount"),
    dt("lastpaydate"), d182("lastpurchamount"), dt("purchasedate"),
    dt("lastservicedate"), d182("ytdpurchases"), d182("totallabor"),
    d182("totalparts"), d182("totalmisc"),
    s("inscompany"), s("inspolicyno"), dt("inspolicyexpdate"),
    d182("inspolicycollisionded"), d182("inspolicycomprehensiveded"),
    d182("inspolicyfiretheftded"),
    s("driverlicensestorprov"), dt("driverlicenseexpdate"),
    s("paymenttype"),
    ts("dateadded"), ts("lastupdated"), ts("rowlastupdated"),
    ts("rowlastupdatedutc"), ts("deletedate"), b("isdeleted"),
    s("accountingaccount"), s("cora_acct_id"), s("cora_acct_code")))

  /** `source_data.service_history` (`redshift_table_schemas.sql:236-274`). */
  val serviceHistory: StructType = StructType(Seq(
    s("serviceno"), s("custno"), s("servicelocation"),
    s("vin"), s("year"), s("makename"), s("modelname"), d182("mileage"),
    s("servicetype"), ts("servicedate"), ts("completiondate"),
    s("servicedescription"),
    d82("laborhours"), d82("laborrate"), d182("laboramount"),
    d182("partsamount"), d182("miscamount"), d182("totalamount"),
    d182("customerpaid"), d182("warrantyamount"),
    s("serviceadvisor"), s("technician"),
    ts("rowlastupdatedutc")))
}
