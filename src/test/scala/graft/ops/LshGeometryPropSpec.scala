package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** Properties of the LSH geometry parameterization: any (bands,
  * rowsPerBand) / (bands, planesPerBand) choice must produce
  * structurally consistent signature schemas and oracle SQL — the
  * guarantee that lets a deployment retune geometry without touching
  * operator code.
  */
object LshGeometryPropSpec extends Properties("LshGeometry") {

  private val minhashGeom: Gen[LshGeometry] = for {
    b <- Gen.choose(1, 6)
    r <- Gen.choose(1, 4)
    cap <- Gen.choose(100L, 100000L)
  } yield LshGeometry(b, r, cap)

  private val signGeom: Gen[SignLshGeometry] = for {
    b <- Gen.choose(1, 4)
    p <- Gen.choose(1, 6)
  } yield SignLshGeometry(b, p, dims = 64)

  property("k and digest count are consistent") =
    Prop.forAll(minhashGeom) { g =>
      g.k == g.bands * g.rowsPerBand &&
        g.digests * 4 >= g.k && (g.digests - 1) * 4 < g.k
    }

  property("generated CTE SQL carries every band and signature column") =
    Prop.forAll(minhashGeom) { g =>
      val sql = Dedup.neardupCtesSqlFor(g)
      // one band-select per band, each referencing its rowsPerBand h's
      (0 until g.bands).forall(b => sql.contains(s"SELECT doc_id, $b AS band")) &&
        (0 until g.k).forall(k => sql.contains(s"AS h$k")) &&
        sql.contains(s"bn <= ${g.maxBucketSize}")
    }

  property("signature schema has exactly k hash columns for any geometry") =
    Prop.forAll(Gen.oneOf(Seq(LshGeometry(2, 4), LshGeometry(3, 2), LshGeometry(5, 1)))) { g =>
      val spark = graft.SparkTestSession.spark
      graft.GraftExtensions.register(spark)
      val sh = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(1)
        .selectExpr("doc_id", "graft_shingle_array(text, 3) AS shs")
        .selectExpr("doc_id", "shs", "CAST(size(shs) AS BIGINT) AS n_sh")
      val schema = Dedup.signatures(sh, g).schema.fieldNames.toSeq
      schema == ("doc_id" +: (0 until g.k).map(k => s"h$k"))
    }

  property("sign-LSH plane count follows bands × planesPerBand") =
    Prop.forAll(signGeom) { g => g.planes == g.bands * g.planesPerBand }
}
