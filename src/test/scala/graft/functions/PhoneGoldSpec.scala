package graft.functions

import graft.SparkSpec
import graft.queries.TextQueries.{phoneGoldFixture, phoneGoldRegions}
import org.apache.spark.sql.functions._

/** The q576 gold gate's discriminating power: (1) the production
  * resolve+dispatch path agrees with every hand label; (2) a
  * deliberately-wrong table read — forcing each row through the US
  * rules instead of its resolved region — flips rows, so a wrong
  * PhoneRules entry CANNOT pass the gold gate (the failure mode VERDICT
  * r10 named for the self-replaying q569/q574 oracles). */
class PhoneGoldSpec extends SparkSpec {

  private def fixtureDf = {
    val s = spark; import s.implicits._
    phoneGoldFixture.map { case (id, p, r, e) => (id, p, r.orNull, e.orNull) }
      .toDF("rid", "phone", "region", "gold_e164")
  }

  test("gold fixture: resolve+dispatch matches every hand label") {
    val s = spark; import s.implicits._
    val got = fixtureDf
      .select(col("rid"),
        PhoneRules.resolveRegion(col("phone"), col("region")).as("ru"),
        col("gold_e164"))
      .select(col("rid"), col("ru"), col("gold_e164"))
    val resolved = got.as[(Long, String, String)].collect()
    resolved.foreach { case (id, ru, _) =>
      assert(ru == phoneGoldRegions(id),
        s"row $id resolved region $ru != gold ${phoneGoldRegions(id)}")
    }
    val parsed = fixtureDf
      .select(col("rid"), col("gold_e164"),
        PhoneRules.parsePhoneDispatch(col("phone"),
          PhoneRules.resolveRegion(col("phone"), col("region"))).as("e164"))
      .as[(Long, String, String)].collect()
    parsed.foreach { case (id, gold, got0) =>
      assert(got0 == gold, s"row $id parsed $got0 != gold $gold")
    }
  }

  test("a wrong table read flips gold rows (the gate is not vacuous)") {
    val s = spark; import s.implicits._
    // dispatch every row through the US table regardless of its
    // resolved region — the analogue of a corrupted rules entry
    val wrong = fixtureDf
      .select(col("rid"), col("gold_e164"),
        PhoneRules.parsePhoneDispatch(col("phone"), lit("US")).as("e164"))
      .as[(Long, String, String)].collect()
    val flipped = wrong.count { case (_, gold, got0) => got0 != gold }
    assert(flipped >= 10,
      s"expected the wrong table to flip >=10 of ${wrong.length} gold rows, flipped $flipped")
  }
}
