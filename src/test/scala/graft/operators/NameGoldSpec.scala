package graft.operators

import graft.SparkSpec
import graft.queries.QualityQueries.{nameGoldFixture, nameGoldLabels}
import org.apache.spark.sql.functions._

/** The q577 gold gate's discriminating power: (1) nameColumnStats
  * reproduces every hand label; (2) a deliberately-wrong dictionary
  * entry changes the labeled output — so a corrupted genderDict row
  * CANNOT pass the gold gate (q572/q573's generated oracles would
  * replay such a corruption; the gold VALUES can't). */
class NameGoldSpec extends SparkSpec {

  private def statsOf(colName: String,
      dict: Seq[(String, Double)] = SensitiveDetect.genderDict) = {
    val s = spark; import s.implicits._
    val rows = nameGoldFixture.toMap.apply(colName)
    SensitiveDetect.nameColumnStats(rows.toDF("v"), col("v"), colName, dict)
      .select(col("column"), col("avg_name_frac"), col("guards_passed"),
        col("treat_as_name"), col("best_gender_strategy"),
        col("best_n_male"), col("best_n_female"), col("best_n_other"))
      .as[(String, Double, Int, Int, String, Long, Long, Long)]
      .collect()(0)
  }

  test("gold fixture: every hand label reproduced") {
    nameGoldLabels.foreach { case exp @ (name, _, _, _, _, _, _, _) =>
      val got = statsOf(name)
      assert(got == exp, s"column $name: got $got, gold $exp")
    }
  }

  test("a wrong dictionary entry flips gold labels (the gate is not vacuous)") {
    // corrupt ONE entry: james marked female — every column whose
    // winning strategy reads 'james' must now miss its gold m/f counts
    val corrupted = SensitiveDetect.genderDict.map {
      case ("james", _) => ("james", 0.01)
      case kv => kv
    }
    val flipped = Seq("first_first", "comma_sep", "last_first").map { c =>
      val gold = nameGoldLabels.find(_._1 == c).get
      statsOf(c, corrupted) != gold
    }
    assert(flipped.forall(identity),
      s"corrupted dict must flip first_first/comma_sep/last_first, got $flipped")
    // the honorific column ignores the gender dict for its winner's
    // counts, so IT stays green — the corruption localizes
    assert(statsOf("honorific_col", corrupted) ==
      nameGoldLabels.find(_._1 == "honorific_col").get)
  }
}
