package graft.meta.app

import scala.util.Try

/** S9 — the AWS identity/region provider chain (reference:
  * src/utils/helper.py:96-151).
  *
  * The reference resolves, in order:
  *  - region (get_aws_region): AWS_REGION env → AWS_DEFAULT_REGION env
  *    → the SDK session's configured region → the IMDS
  *    instance-identity document's `region`;
  *  - account id (get_account_id_v1): AWS_ACCOUNT_ID env → STS
  *    GetCallerIdentity → (get_account_id) the IMDS document's
  *    `accountId`.
  *
  * Every rung is injectable so the chain ORDER is unit-testable
  * offline (AwsIdentitySpec); the default rungs are real: JVM env,
  * IMDSv1 HTTP with sub-second timeouts, and STS via the same
  * reflection shim pattern as [[graft.meta.catalog.AwsSdkGlueApi]]
  * (compiles without the SDK, works when the jars are present).
  * `AlteratorCli` uses `accountId` when `--account-id` is not given.
  */
final class AwsIdentity(
    env: String => Option[String] = k => sys.env.get(k).filter(_.nonEmpty),
    sdkRegion: () => Option[String] = () => AwsIdentity.sdkSessionRegion(),
    stsAccount: () => Option[String] = () => AwsIdentity.sdkStsAccount(),
    imdsDocument: () => Option[String] = AwsIdentity.fetchImdsDocument) {

  private lazy val doc: Option[String] = imdsDocument()

  private def imdsField(field: String): Option[String] =
    doc.flatMap { json =>
      // the document is flat JSON; a targeted extract avoids a parser
      // dependency in this tiny chain
      s""""$field"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))
    }

  /** get_aws_region (helper.py:109-135). */
  def region: Option[String] =
    env("AWS_REGION")
      .orElse(env("AWS_DEFAULT_REGION"))
      .orElse(sdkRegion())
      .orElse(imdsField("region"))

  /** get_account_id_v1 + get_account_id fallback (helper.py:96-151). */
  def accountId: Option[String] =
    env("AWS_ACCOUNT_ID")
      .orElse(stsAccount())
      .orElse(imdsField("accountId"))
}

object AwsIdentity {
  val Default = new AwsIdentity()

  /** IMDSv1 instance-identity document — the reference shells out to
    * `curl http://169.254.169.254/...` (helper.py:101-103); this is the
    * same GET with tight timeouts so a non-EC2 host fails in <1 s. */
  def fetchImdsDocument(): Option[String] = Try {
    val url = java.net.URI
      .create("http://169.254.169.254/latest/dynamic/instance-identity/document")
      .toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(800)
    conn.setReadTimeout(800)
    try {
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } finally conn.disconnect()
  }.toOption.filter(_.nonEmpty)

  /** The SDK session's configured region (profile/config file), via
    * reflection — absent SDK jars ⇒ None. `load` is a seam so
    * AwsSdkShapeSpec can pin the method names/arity against stand-in
    * classes with the SDK's documented shape. */
  def sdkSessionRegion(load: String => Class[_] = Class.forName): Option[String] = Try {
    val chain = load(
      "software.amazon.awssdk.regions.providers.DefaultAwsRegionProviderChain")
      .getMethod("builder").invoke(null)
    val built = chain.getClass.getMethod("build").invoke(chain)
    built.getClass.getMethod("getRegion").invoke(built).toString
  }.toOption.filter(_.nonEmpty)

  /** STS GetCallerIdentity().account, via reflection — absent SDK jars
    * or no credentials ⇒ None. `load` seam as in [[sdkSessionRegion]]. */
  def sdkStsAccount(load: String => Class[_] = Class.forName): Option[String] = Try {
    val client = load("software.amazon.awssdk.services.sts.StsClient")
      .getMethod("create").invoke(null)
    val resp = client.getClass.getMethod("getCallerIdentity").invoke(client)
    resp.getClass.getMethod("account").invoke(resp).toString
  }.toOption.filter(_.nonEmpty)
}
