package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.app.AwsIdentity

/** The S9 provider chains resolve in the reference's order
  * (helper.py:96-151), with every rung injectable.
  */
class AwsIdentitySpec extends AnyFunSuite {

  private val imdsDoc = Some(
    """{"accountId" : "111122223333", "region" : "eu-west-1", "instanceId" : "i-0abc"}""")

  private def identity(
      env: Map[String, String] = Map.empty,
      sdkRegion: Option[String] = None,
      sts: Option[String] = None,
      imds: Option[String] = None) =
    new AwsIdentity(
      env = k => env.get(k),
      sdkRegion = () => sdkRegion,
      stsAccount = () => sts,
      imdsDocument = () => imds)

  test("region: AWS_REGION wins over everything") {
    val id = identity(
      env = Map("AWS_REGION" -> "us-east-1", "AWS_DEFAULT_REGION" -> "us-east-2"),
      sdkRegion = Some("ap-south-1"), imds = imdsDoc)
    assert(id.region.contains("us-east-1"))
  }

  test("region: AWS_DEFAULT_REGION, then SDK config, then IMDS") {
    assert(identity(env = Map("AWS_DEFAULT_REGION" -> "us-east-2"),
      sdkRegion = Some("ap-south-1")).region.contains("us-east-2"))
    assert(identity(sdkRegion = Some("ap-south-1"), imds = imdsDoc)
      .region.contains("ap-south-1"))
    assert(identity(imds = imdsDoc).region.contains("eu-west-1"))
    assert(identity().region.isEmpty)
  }

  test("accountId: AWS_ACCOUNT_ID, then STS, then IMDS document") {
    assert(identity(env = Map("AWS_ACCOUNT_ID" -> "999900001111"),
      sts = Some("444455556666"), imds = imdsDoc)
      .accountId.contains("999900001111"))
    assert(identity(sts = Some("444455556666"), imds = imdsDoc)
      .accountId.contains("444455556666"))
    assert(identity(imds = imdsDoc).accountId.contains("111122223333"))
    assert(identity().accountId.isEmpty)
  }

  test("default rungs fail soft on a non-AWS offline host") {
    // no IMDS endpoint, no SDK jars, no creds — every rung must return
    // None (fast) rather than throw
    assert(AwsIdentity.sdkSessionRegion().isEmpty)
    assert(AwsIdentity.sdkStsAccount().isEmpty)
    assert(AwsIdentity.fetchImdsDocument().isEmpty)
  }
}
