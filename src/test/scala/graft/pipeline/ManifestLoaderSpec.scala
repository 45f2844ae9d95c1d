package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.collection.immutable.VectorMap

class ManifestLoaderSpec extends SparkSpec {
  import spark.implicits._

  /** The reference's examples/pipeline/pipeline.yaml, structurally verbatim
    * (apiVersion/kind/metadata/spec/backend/middlewares/steps/dependsOn/
    * settings/backendConfig, incl. the vault secret placeholder). */
  private val exampleYaml =
    """apiVersion: wurzel.dev/v1alpha1
      |kind: Pipeline
      |metadata:
      |  name: pipelinedemo
      |spec:
      |  backend: dvc
      |  middlewares:
      |    - name: prometheus
      |    - name: secret_resolver
      |      settings:
      |        URL: "http://127.0.0.1:54321"
      |  steps:
      |    - name: source
      |      class: wurzel.steps.manual_markdown.ManualMarkdownStep
      |      settings:
      |        FOLDER_PATH: "${secret:vault:demo_folder_path}"
      |    - name: splitter
      |      class: wurzel.steps.splitter.SimpleSplitterStep
      |      dependsOn: [source]
      |      settings:
      |        BATCH_SIZE: "100"
      |        NUM_THREADS: "4"
      |  backendConfig:
      |    dvc:
      |      dataDir: ./data
      |      encapsulateEnv: true
      |""".stripMargin

  test("round-trips the reference example manifest's structure") {
    val m = Manifest.parse(exampleYaml)
    assert(m.apiVersion == "wurzel.dev/v1alpha1" && m.kind == "Pipeline")
    assert(m.metadata.name == "pipelinedemo")
    assert(m.spec.backend == "dvc")
    assert(m.spec.middlewares.map(_.name) == Vector("prometheus", "secret_resolver"))
    assert(m.spec.middlewares(1).settings == VectorMap("URL" -> "http://127.0.0.1:54321"))
    assert(m.spec.steps.map(_.name) == Vector("source", "splitter"))
    assert(m.spec.steps(0).className == "wurzel.steps.manual_markdown.ManualMarkdownStep")
    assert(m.spec.steps(0).simpleClassName == "ManualMarkdownStep")
    assert(m.spec.steps(1).dependsOn == Vector("source"))
    assert(m.spec.steps(1).settings == VectorMap("BATCH_SIZE" -> "100", "NUM_THREADS" -> "4"))
    assert(m.spec.backendConfigFor("dvc") ==
      VectorMap("dataDir" -> "./data", "encapsulateEnv" -> "true"))
    assert(m.spec.backendConfigFor("argo").isEmpty)
    assert(Manifest.validate(m).isEmpty)
  }

  test("schema errors fail fast; semantic errors come back as strings (validator contract)") {
    intercept[IllegalArgumentException](Manifest.parse("kind: NotAPipeline\n"))
    intercept[IllegalArgumentException](
      Manifest.parse("kind: Pipeline\nmetadata: {name: x}\nspec: {backend: dvc, steps: []}\n"))
    // unknown dependsOn + duplicate name + cycle: reported, not thrown.
    // (the cycle lives on distinct names — a duplicate name would mask it
    // via last-wins adjacency, same as the reference's dict comprehension)
    val bad = Manifest.parse(
      """kind: Pipeline
        |metadata: {name: bad}
        |spec:
        |  backend: dvc
        |  steps:
        |    - {name: a, class: X, dependsOn: [ghost, b]}
        |    - {name: b, class: X, dependsOn: [a]}
        |    - {name: c, class: X}
        |    - {name: c, class: X}
        |""".stripMargin)
    val errs = Manifest.validate(bad)
    assert(errs.exists(_.contains("'ghost'")), errs)
    assert(errs.exists(_.contains("defined 2 times")), errs)
    assert(errs.exists(_.toLowerCase.contains("cycle")), errs)
  }

  test("conflicting settings under one class are a validation error; identical settings are not") {
    def m(s2: String) = Manifest.parse(
      s"""kind: Pipeline
         |metadata: {name: col}
         |spec:
         |  backend: dvc
         |  steps:
         |    - {name: a, class: pkg.Splitter, settings: {BATCH: "100"}}
         |    - {name: b, class: pkg.Splitter, settings: $s2}
         |""".stripMargin)
    // env keys by class name: {BATCH:100} vs {BATCH:500} would silently
    // last-wins in environment() — must be reported, not dropped
    val conflicting = Manifest.validate(m("""{BATCH: "500"}"""))
    assert(conflicting.exists(_.contains("conflicting settings")), conflicting)
    assert(Manifest.validate(m("""{BATCH: "100"}""")).isEmpty)
  }

  test("validator never throws on a deep linear chain (explicit-stack DFS)") {
    val steps = (0 until 10000).map { i =>
      if (i == 0) s"    - {name: s$i, class: X}"
      else s"    - {name: s$i, class: X, dependsOn: [s${i - 1}]}"
    }.mkString("\n")
    val deep = Manifest.parse(
      s"kind: Pipeline\nmetadata: {name: deep}\nspec:\n  backend: dvc\n  steps:\n$steps\n")
    assert(Manifest.validate(deep).isEmpty)
  }

  test("env expansion matches the reference's expander semantics") {
    assert(Manifest.expandStepSettings("ManualMarkdownStep",
      VectorMap("FOLDER_PATH" -> "./data")) ==
      VectorMap("MANUALMARKDOWNSTEP__FOLDER_PATH" -> "./data"))
    assert(Manifest.expandMiddlewareSettings("prometheus",
      VectorMap("GATEWAY" -> "host:9091")) ==
      VectorMap("PROMETHEUS__GATEWAY" -> "host:9091"))
    assert(Manifest.expandMiddlewaresList(Seq("secret_resolver", "prometheus")) ==
      VectorMap("MIDDLEWARES" -> "secret_resolver,prometheus"))
    val env = Manifest.environment(Manifest.parse(exampleYaml))
    assert(env("MANUALMARKDOWNSTEP__FOLDER_PATH") == "${secret:vault:demo_folder_path}")
    assert(env("SIMPLESPLITTERSTEP__BATCH_SIZE") == "100")
    assert(env("SECRET_RESOLVER__URL") == "http://127.0.0.1:54321")
    assert(env("MIDDLEWARES") == "prometheus,secret_resolver")
  }

  test("secret placeholders: parse, find, resolve through a provider registry") {
    assert(Manifest.parsePlaceholder("${secret:vault:db-pass}") ==
      Some(SecretRef("vault", "db-pass")))
    assert(Manifest.parsePlaceholder("plain-value").isEmpty)
    assert(Manifest.parsePlaceholder("${secret:malformed}").isEmpty)
    val env = VectorMap(
      "DB_PASSWORD" -> "${secret:vault:db-pass}",
      "HOST" -> "localhost",
      "API_KEY" -> "${secret:k8s:api-secret}")
    val found = Manifest.findPlaceholderVars(env)
    assert(found.keys.toSeq.sorted == Seq("API_KEY", "DB_PASSWORD"))
    assert(found("DB_PASSWORD") == SecretRef("vault", "db-pass"))
    val resolved = Manifest.resolveSecrets(env, Map(
      "vault" -> (r => s"v:$r"), "k8s" -> (r => s"k:$r")))
    assert(resolved == VectorMap(
      "DB_PASSWORD" -> "v:db-pass", "HOST" -> "localhost", "API_KEY" -> "k:api-secret"))
    intercept[IllegalArgumentException](
      Manifest.resolveSecrets(env, Map.empty): Unit)
  }

  test("builds a runnable engine Pipeline from a chain manifest; DAGs topo-sort deterministically") {
    val chain = Manifest.parse(
      """kind: Pipeline
        |metadata: {name: chain}
        |spec:
        |  backend: dvc
        |  steps:
        |    - name: drop
        |      class: graft.pipeline.DropDuplicationStep
        |      settings: {DROP_BY_FIELDS: "md"}
        |    - name: keep
        |      class: UrlFilterStep
        |      dependsOn: [drop]
        |      settings: {URL_FRAGMENT: "/other", URL_COL: "url"}
        |    - name: order
        |      class: DeterministicSortStep
        |      dependsOn: [keep]
        |      settings: {SORT_BY: "url"}
        |""".stripMargin)
    val p = Manifest.toPipeline(chain)
    assert(p.history == "DropDuplication-UrlFilter-DeterministicSort")
    val in = Seq(
      ("https://x/kb/a", "doc one"), ("https://x/kb/a", "doc one"),
      ("https://x/other", "doc two"), ("https://x/kb/b", "doc three"))
      .toDF("url", "md")
    val out = p.run(in).select("url").as[String].collect().toSeq
    assert(out == Seq("https://x/kb/a", "https://x/kb/b"))

    // diamond: a -> {b, c} -> d is not a chain; buildSteps gives a valid,
    // deterministic topological order (manifest position breaks ties)
    val diamond = Manifest.parse(
      """kind: Pipeline
        |metadata: {name: d}
        |spec:
        |  backend: dvc
        |  steps:
        |    - {name: d, class: DeterministicSortStep, dependsOn: [b, c]}
        |    - {name: b, class: DeterministicSortStep, dependsOn: [a]}
        |    - {name: c, class: DeterministicSortStep, dependsOn: [a]}
        |    - {name: a, class: DeterministicSortStep}
        |""".stripMargin)
    intercept[IllegalArgumentException](Manifest.toPipeline(diamond): Unit)
    assert(Manifest.buildSteps(diamond).map(_._1.name) == Vector("a", "b", "c", "d"))
    assert(Manifest.terminalSteps(diamond).map(_.name) == Vector("d"))
  }

  test("unregistered step class fails fast with the class and step named") {
    val m = Manifest.parse(
      """kind: Pipeline
        |metadata: {name: x}
        |spec:
        |  backend: dvc
        |  steps:
        |    - {name: mystery, class: com.example.NoSuchStep}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](Manifest.buildSteps(m): Unit)
    assert(e.getMessage.contains("NoSuchStep") && e.getMessage.contains("mystery"))
  }
}
