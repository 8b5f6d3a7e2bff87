package graft.meta.sdkshape

/** Stand-in classes reproducing the AWS SDK v2's DOCUMENTED public
  * shapes — fluent builders obtained from a static `builder()`, model
  * getters named exactly after their fields (`name()`, `type()`,
  * `tableVersions()`, `sdkHttpResponse().statusCode()`, …) — so
  * AwsSdkShapeSpec can drive [[graft.meta.catalog.AwsSdkGlueApi]]'s
  * reflection bindings end-to-end offline. Method names and arities
  * here are copied from the public SDK javadocs (the same shapes
  * glue_utils.py:13-114 exercises through boto3); if a binding in
  * AwsSdkGlueApi drifts from them, its `call` lookup throws
  * NoSuchMethodException and the spec fails — the round-3 self-review
  * bug class (wrong reflection signature compiles silently) can't
  * recur unseen.
  *
  * State flows through [[ShapeWorld]] because the API under test
  * constructs its client via the static `builder()` chain, leaving no
  * seam to hand a fake instance through.
  */
object ShapeWorld {
  var table: ShapeTable = null
  var versions: java.util.List[AnyRef] = java.util.List.of()
  var updateStatus: Int = 200
  var failGet: Option[RuntimeException] = None
  var lastGetTable: ShapeGetTableRequest = null
  var lastGetVersions: ShapeGetTableVersionsRequest = null
  var lastUpdate: ShapeUpdateTableRequest = null
  var builtRegion: ShapeRegion = null

  def reset(): Unit = {
    table = null; versions = java.util.List.of(); updateStatus = 200
    failGet = None; lastGetTable = null; lastGetVersions = null
    lastUpdate = null; builtRegion = null
  }
}

/** software.amazon.awssdk.services.glue.model.EntityNotFoundException
  * stand-in: only the simple name matters (glueError keys on it). */
final class EntityNotFoundException(msg: String) extends RuntimeException(msg)

// ---- regions ----

final class ShapeRegion(val id: String) { override def toString: String = id }
object ShapeRegion { def of(s: String): ShapeRegion = new ShapeRegion(s) }

// ---- client ----

final class ShapeGlueClientBuilder {
  private var r: ShapeRegion = null
  def region(reg: ShapeRegion): ShapeGlueClientBuilder = { r = reg; this }
  def build(): ShapeGlueClient = { ShapeWorld.builtRegion = r; new ShapeGlueClient }
}

final class ShapeGlueClient {
  def getTable(req: ShapeGetTableRequest): ShapeGetTableResponse = {
    ShapeWorld.failGet.foreach(e => throw e)
    ShapeWorld.lastGetTable = req
    new ShapeGetTableResponse(ShapeWorld.table)
  }
  def getTableVersions(req: ShapeGetTableVersionsRequest): ShapeGetTableVersionsResponse = {
    ShapeWorld.lastGetVersions = req
    new ShapeGetTableVersionsResponse(ShapeWorld.versions)
  }
  def updateTable(req: ShapeUpdateTableRequest): ShapeUpdateTableResponse = {
    ShapeWorld.lastUpdate = req
    new ShapeUpdateTableResponse(new ShapeSdkHttpResponse(ShapeWorld.updateStatus))
  }
}
object ShapeGlueClient { def builder(): ShapeGlueClientBuilder = new ShapeGlueClientBuilder }

// ---- requests ----

final class ShapeGetTableRequest(val databaseName: String, val name: String)
final class ShapeGetTableRequestBuilder {
  private var db: String = null
  private var nm: String = null
  def databaseName(v: String): ShapeGetTableRequestBuilder = { db = v; this }
  def name(v: String): ShapeGetTableRequestBuilder = { nm = v; this }
  def build(): ShapeGetTableRequest = new ShapeGetTableRequest(db, nm)
}
object ShapeGetTableRequest {
  def builder(): ShapeGetTableRequestBuilder = new ShapeGetTableRequestBuilder
}

final class ShapeGetTableVersionsRequest(val databaseName: String, val tableName: String)
final class ShapeGetTableVersionsRequestBuilder {
  private var db: String = null
  private var tn: String = null
  def databaseName(v: String): ShapeGetTableVersionsRequestBuilder = { db = v; this }
  def tableName(v: String): ShapeGetTableVersionsRequestBuilder = { tn = v; this }
  def build(): ShapeGetTableVersionsRequest = new ShapeGetTableVersionsRequest(db, tn)
}
object ShapeGetTableVersionsRequest {
  def builder(): ShapeGetTableVersionsRequestBuilder = new ShapeGetTableVersionsRequestBuilder
}

final class ShapeUpdateTableRequest(val databaseName: String, val tableInput: ShapeTableInput)
final class ShapeUpdateTableRequestBuilder {
  private var db: String = null
  private var ti: ShapeTableInput = null
  def databaseName(v: String): ShapeUpdateTableRequestBuilder = { db = v; this }
  def tableInput(v: ShapeTableInput): ShapeUpdateTableRequestBuilder = { ti = v; this }
  def build(): ShapeUpdateTableRequest = new ShapeUpdateTableRequest(db, ti)
}
object ShapeUpdateTableRequest {
  def builder(): ShapeUpdateTableRequestBuilder = new ShapeUpdateTableRequestBuilder
}

// ---- model ----

final class ShapeColumn(n: String, t: String, c: String) {
  def name(): String = n
  def `type`(): String = t
  def comment(): String = c
}
final class ShapeColumnBuilder {
  private var n: String = null
  private var t: String = null
  private var c: String = null
  def name(v: String): ShapeColumnBuilder = { n = v; this }
  def `type`(v: String): ShapeColumnBuilder = { t = v; this }
  def comment(v: String): ShapeColumnBuilder = { c = v; this }
  def build(): ShapeColumn = new ShapeColumn(n, t, c)
}
object ShapeColumn { def builder(): ShapeColumnBuilder = new ShapeColumnBuilder }

final class ShapeSerDeInfo(lib: String) { def serializationLibrary(): String = lib }
final class ShapeSerDeInfoBuilder {
  private var lib: String = null
  def serializationLibrary(v: String): ShapeSerDeInfoBuilder = { lib = v; this }
  def build(): ShapeSerDeInfo = new ShapeSerDeInfo(lib)
}
object ShapeSerDeInfo { def builder(): ShapeSerDeInfoBuilder = new ShapeSerDeInfoBuilder }

final class ShapeStorageDescriptor(
    cols: java.util.List[AnyRef], loc: String, in: String, out: String,
    serde: ShapeSerDeInfo) {
  def columns(): java.util.List[AnyRef] = cols
  def location(): String = loc
  def inputFormat(): String = in
  def outputFormat(): String = out
  def serdeInfo(): ShapeSerDeInfo = serde
}
final class ShapeStorageDescriptorBuilder {
  private var cols: java.util.List[AnyRef] = java.util.List.of()
  private var loc: String = null
  private var in: String = null
  private var out: String = null
  private var serde: ShapeSerDeInfo = null
  def columns(v: java.util.List[AnyRef]): ShapeStorageDescriptorBuilder = { cols = v; this }
  def location(v: String): ShapeStorageDescriptorBuilder = { loc = v; this }
  def inputFormat(v: String): ShapeStorageDescriptorBuilder = { in = v; this }
  def outputFormat(v: String): ShapeStorageDescriptorBuilder = { out = v; this }
  def serdeInfo(v: ShapeSerDeInfo): ShapeStorageDescriptorBuilder = { serde = v; this }
  def build(): ShapeStorageDescriptor = new ShapeStorageDescriptor(cols, loc, in, out, serde)
}
object ShapeStorageDescriptor {
  def builder(): ShapeStorageDescriptorBuilder = new ShapeStorageDescriptorBuilder
}

final class ShapeTableInput(
    nm: String, tt: String, sd: ShapeStorageDescriptor,
    pk: java.util.List[AnyRef], params: java.util.Map[String, String]) {
  def name(): String = nm
  def tableType(): String = tt
  def storageDescriptor(): ShapeStorageDescriptor = sd
  def partitionKeys(): java.util.List[AnyRef] = pk
  def parameters(): java.util.Map[String, String] = params
}
final class ShapeTableInputBuilder {
  private var nm: String = null
  private var tt: String = null
  private var sd: ShapeStorageDescriptor = null
  private var pk: java.util.List[AnyRef] = java.util.List.of()
  private var params: java.util.Map[String, String] = java.util.Map.of()
  def name(v: String): ShapeTableInputBuilder = { nm = v; this }
  def tableType(v: String): ShapeTableInputBuilder = { tt = v; this }
  def storageDescriptor(v: ShapeStorageDescriptor): ShapeTableInputBuilder = { sd = v; this }
  def partitionKeys(v: java.util.List[AnyRef]): ShapeTableInputBuilder = { pk = v; this }
  def parameters(v: java.util.Map[String, String]): ShapeTableInputBuilder = { params = v; this }
  def build(): ShapeTableInput = new ShapeTableInput(nm, tt, sd, pk, params)
}
object ShapeTableInput { def builder(): ShapeTableInputBuilder = new ShapeTableInputBuilder }

final class ShapeTable(
    nm: String, sd: ShapeStorageDescriptor, pk: java.util.List[AnyRef],
    tt: String, params: java.util.Map[String, String], vId: String, cId: String) {
  def name(): String = nm
  def storageDescriptor(): ShapeStorageDescriptor = sd
  def partitionKeys(): java.util.List[AnyRef] = pk
  def tableType(): String = tt
  def parameters(): java.util.Map[String, String] = params
  def versionId(): String = vId
  def catalogId(): String = cId
}

// ---- responses ----

final class ShapeGetTableResponse(t: ShapeTable) { def table(): ShapeTable = t }

final class ShapeTableVersion(vId: String) { def versionId(): String = vId }
final class ShapeGetTableVersionsResponse(vs: java.util.List[AnyRef]) {
  def tableVersions(): java.util.List[AnyRef] = vs
}

final class ShapeSdkHttpResponse(code: Int) { def statusCode(): Int = code }
final class ShapeUpdateTableResponse(http: ShapeSdkHttpResponse) {
  def sdkHttpResponse(): ShapeSdkHttpResponse = http
}

// ---- identity-chain shapes (AwsIdentity's reflection rungs) ----

final class ShapeRegionProvider(r: ShapeRegion) { def getRegion(): ShapeRegion = r }
final class ShapeRegionChainBuilder {
  def build(): ShapeRegionProvider = new ShapeRegionProvider(new ShapeRegion("eu-shape-1"))
}
final class ShapeRegionProviderChain
object ShapeRegionProviderChain {
  def builder(): ShapeRegionChainBuilder = new ShapeRegionChainBuilder
}

final class ShapeCallerIdentity { def account(): String = "123456789012" }
final class ShapeStsClient {
  def getCallerIdentity(): ShapeCallerIdentity = new ShapeCallerIdentity
}
object ShapeStsClient { def create(): ShapeStsClient = new ShapeStsClient }
