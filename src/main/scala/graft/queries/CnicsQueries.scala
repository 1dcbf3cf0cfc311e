package graft.queries

import org.apache.spark.sql.functions._
import graft.model.CnicsFixtures
import graft.pipeline.CnicsPipeline
import graft.sinks.InMemoryFhirStore

/** Driver-visible end-to-end gate for the CNICS reference pipeline:
  * runs the full job (cohort → resources → merge → sink → audit) on
  * the deterministic demo fixtures. The audit oracle is a literal —
  * the pipeline's 12 counters are fully determined by the fixtures
  * (and independently pinned by the golden-JSON ScalaTests). */
object CnicsQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "cnics_e2e_audit",
      "full reference pipeline on demo fixtures → 12-counter audit (E1)",
      (s, _) => {
        import s.implicits._
        val store = new InMemoryFhirStore
        val audit = new CnicsPipeline(s, CnicsFixtures.demo(s), store, "uw").run()
        audit.toSeq.map { case ((rt, a), n) => (rt, a, n) }
          .toDF("resource_type", "action", "n")
      },
      Some("""SELECT * FROM (VALUES
             | ('Patient', 'insert', CAST(2 AS BIGINT)), ('Patient', 'update', CAST(0 AS BIGINT)), ('Patient', 'delete', CAST(0 AS BIGINT)),
             | ('Condition', 'insert', CAST(2 AS BIGINT)), ('Condition', 'update', CAST(0 AS BIGINT)), ('Condition', 'delete', CAST(0 AS BIGINT)),
             | ('MedicationRequest', 'insert', CAST(1 AS BIGINT)), ('MedicationRequest', 'update', CAST(0 AS BIGINT)), ('MedicationRequest', 'delete', CAST(0 AS BIGINT)),
             | ('Observation', 'insert', CAST(3 AS BIGINT)), ('Observation', 'update', CAST(0 AS BIGINT)), ('Observation', 'delete', CAST(0 AS BIGINT))
             |) t(resource_type, action, n)""".stripMargin)),

    QueryDef(
      "cnics_patient_resources",
      "assembled Patient resources (key, id, json) from demo fixtures",
      (s, _) => new CnicsPipeline(s, CnicsFixtures.demo(s), new InMemoryFhirStore, "uw")
        .patientResources().select("key", "id", "json"),
      None)
  )
}
