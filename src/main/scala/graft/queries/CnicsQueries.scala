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

    // ── The emitted FHIR JSON itself, pinned by content hash: each
    //    resource is canonicalized (sorted keys, no whitespace —
    //    JsonCanon) and SHA-256'd; the oracle is the committed golden
    //    hashes, which CnicsPipelineSpec independently derives from
    //    the golden JSON documents. A serialization regression turns
    //    this row red in the driver gate; previously it was a
    //    rows-only check because raw nested JSON can't be replayed by
    //    an oracle engine. ──
    QueryDef(
      "cnics_patient_resources",
      "assembled Patient resources: key, id, sha256(canonical json) vs committed goldens",
      (s, _) => {
        import s.implicits._
        new CnicsPipeline(s, CnicsFixtures.demo(s), new InMemoryFhirStore, "uw")
          .patientResources().select("key", "id", "json")
          .as[(String, String, String)]
          .map { case (k, i, j) => (k, i, graft.model.JsonCanon.sha256Canonical(j)) }
          .toDF("key", "id", "json_sha256")
      },
      Some(s"""SELECT * FROM (VALUES
             | ('uw-001', 'cnics-uw-uw-001', '${CnicsGoldens.patientSha("uw-001")}'),
             | ('uw-002', 'cnics-uw-uw-002', '${CnicsGoldens.patientSha("uw-002")}')
             |) t(key, id, json_sha256)""".stripMargin))
  )
}

/** Committed golden canonical-JSON hashes for the demo fixtures —
  * derived from (and cross-checked against) the golden JSON documents
  * in CnicsPipelineSpec. */
object CnicsGoldens {
  val patientSha: Map[String, String] = Map(
    "uw-001" -> "ba36cb9308165e953a58faa2f4bf6d1134a98da681b4b8b1d04d0bbb98815ec8",
    "uw-002" -> "38593c864842e1b5b02dd7b9b887ca64fd4c9f5405d41ef95e04a79e4dd82936")
}
