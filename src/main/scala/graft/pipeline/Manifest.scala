package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.collection.immutable.VectorMap
import scala.jdk.CollectionConverters._

/** Declarative pipeline manifest — the reference's YAML ops-config surface
  * (wurzel/manifest: models.py:57-143, loader.py:14-30, validator.py:42-80,
  * builder.py:42-120, env_expander.py:30-52, secrets/placeholder.py:43-69;
  * examples/pipeline/pipeline.yaml), the last reference surface with no
  * engine analog through round 5.
  *
  * Shape: `apiVersion` / `kind: Pipeline` / `metadata{name,labels,
  * annotations}` / `spec{backend, schedule?, middlewares[], steps[],
  * backendConfig}`; each step has `name`, `class`, `dependsOn[]`,
  * `settings{}`. The engine keeps the reference's split of concerns:
  *  - PARSE is schema validation (missing name/class/steps fail fast, the
  *    reference's pydantic layer);
  *  - [[Manifest.validate]] is semantic validation returning human-readable
  *    error STRINGS, never throwing (validator.py contract): unknown
  *    dependsOn refs, duplicate step names, dependency cycles;
  *  - ENV EXPANSION maps short settings keys to the prefixed env-var names
  *    the reference's pydantic-settings consume (`CLASSNAME__KEY`,
  *    `MIDDLEWARENAME__KEY`, `MIDDLEWARES=a,b`);
  *  - SECRET placeholders `${secret:<provider>:<ref>}` parse to
  *    [[SecretRef]]s and resolve through a caller-supplied provider map
  *    (the reference's SecretProvider registry, base.py:31-57);
  *  - BUILD instantiates steps through a name->factory registry (the JVM
  *    analog of builder.py's importlib class loading) and wires the
  *    dependency order. A chain-shaped manifest composes into the engine's
  *    [[Pipeline]]; general DAGs get a deterministic topological order.
  *
  * Backends (dvc/argo emitters) stay out of scope by design: the
  * DataFrame lineage IS the execution DAG here (SURVEY.md §3.3) — what the
  * manifest contributes is declarative authoring + settings/secrets
  * plumbing, and that is what this implements.
  */
final case class SecretRef(provider: String, ref: String)

final case class ManifestStep(
    name: String,
    className: String,
    dependsOn: Vector[String],
    settings: VectorMap[String, String]) {
  /** Simple class name — last dotted segment (env-prefix base, matching
    * the reference's use of the Python class NAME, env_expander.py:35). */
  def simpleClassName: String = className.split('.').last
}

final case class ManifestMiddleware(name: String, settings: VectorMap[String, String])

final case class ManifestMeta(
    name: String,
    labels: VectorMap[String, String],
    annotations: VectorMap[String, String])

final case class ManifestSpec(
    backend: String,
    schedule: Option[String],
    middlewares: Vector[ManifestMiddleware],
    steps: Vector[ManifestStep],
    /** Open per-backend container (models.py BackendConfig, extra=allow):
      * backend name -> config entries, scalars rendered as text. */
    backendConfig: VectorMap[String, VectorMap[String, String]]) {
  def backendConfigFor(backend: String): VectorMap[String, String] =
    backendConfig.getOrElse(backend, VectorMap.empty)
}

final case class PipelineManifest(
    apiVersion: String,
    kind: String,
    metadata: ManifestMeta,
    spec: ManifestSpec)

object Manifest {

  val DefaultApiVersion = "wurzel.dev/v1alpha1"

  private lazy val mapper = new ObjectMapper(new YAMLFactory())

  /** Parse + schema-validate a YAML manifest (loader.py + the pydantic
    * layer). Fails fast with a descriptive message on structural errors;
    * semantic DAG errors are [[validate]]'s job. */
  def parse(yaml: String): PipelineManifest = {
    val root = mapper.readTree(yaml)
    require(root != null && root.isObject, "manifest: top level must be a YAML mapping")
    val kind = textOr(root, "kind", "Pipeline")
    require(kind == "Pipeline", s"manifest: kind must be 'Pipeline', got '$kind'")
    val meta = root.path("metadata")
    require(meta.hasNonNull("name"), "manifest: metadata.name is required")
    val spec = root.path("spec")
    require(spec.isObject, "manifest: spec is required")
    require(spec.hasNonNull("backend"), "manifest: spec.backend is required")
    val stepsNode = spec.path("steps")
    require(stepsNode.isArray && stepsNode.size() > 0,
      "manifest: spec.steps must be a non-empty list")
    val steps = stepsNode.elements().asScala.toVector.map { s =>
      require(s.hasNonNull("name"), "manifest: every step needs a name")
      require(s.hasNonNull("class"), s"manifest: step '${s.path("name").asText}' needs a class")
      ManifestStep(
        s.get("name").asText(),
        s.get("class").asText(),
        strings(s.path("dependsOn")),
        stringMap(s.path("settings")))
    }
    val middlewares = spec.path("middlewares").elements().asScala.toVector.map { m =>
      require(m.hasNonNull("name"), "manifest: every middleware needs a name")
      ManifestMiddleware(m.get("name").asText(), stringMap(m.path("settings")))
    }
    PipelineManifest(
      textOr(root, "apiVersion", DefaultApiVersion),
      kind,
      ManifestMeta(meta.get("name").asText(),
        stringMap(meta.path("labels")), stringMap(meta.path("annotations"))),
      ManifestSpec(
        spec.get("backend").asText(),
        Option(spec.get("schedule")).filter(_.isTextual).map(_.asText()),
        middlewares,
        steps,
        nestedStringMap(spec.path("backendConfig"))))
  }

  def load(path: String): PipelineManifest = {
    val p = java.nio.file.Paths.get(path)
    require(java.nio.file.Files.exists(p), s"manifest file not found: $path")
    parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
  }

  // ---- semantic validation (validator.py contract: error strings, no
  // exceptions; empty = valid) --------------------------------------------

  def validate(m: PipelineManifest): Seq[String] =
    validateStepRefs(m) ++ validateDuplicateNames(m) ++
      validateSettingsCollisions(m) ++ validateNoCycles(m)

  def validateStepRefs(m: PipelineManifest): Seq[String] = {
    val defined = m.spec.steps.map(_.name).toSet
    for {
      s <- m.spec.steps
      d <- s.dependsOn if !defined(d)
    } yield s"Step '${s.name}' depends on '$d', which is not defined in steps."
  }

  def validateDuplicateNames(m: PipelineManifest): Seq[String] =
    m.spec.steps.groupBy(_.name).collect {
      case (n, ss) if ss.length > 1 => s"Step name '$n' is defined ${ss.length} times."
    }.toSeq.sorted

  /** The merged environment keys step settings by CLASS name
    * (pydantic-settings contract), so two steps of the same class with
    * DIFFERENT settings would silently last-wins-overwrite each other in
    * [[environment]] — surface that as a validation error instead. Same
    * class with identical (or absent) settings is fine and common. */
  def validateSettingsCollisions(m: PipelineManifest): Seq[String] =
    m.spec.steps.filter(_.settings.nonEmpty).groupBy(_.simpleClassName).collect {
      case (cls, ss) if ss.map(_.settings).distinct.length > 1 =>
        s"Steps ${ss.map(s => s"'${s.name}'").mkString(", ")} share settings class " +
          s"'$cls' with conflicting settings; class-keyed env expansion would drop all but the last."
    }.toSeq.sorted

  /** DFS three-colour cycle detection (validator.py:62-80); undefined refs
    * are validateStepRefs' finding and are skipped here like the
    * reference does. Explicit-stack DFS — the contract is "error strings,
    * never throws", which recursion would break with StackOverflowError on
    * a deep (legal) linear chain. */
  def validateNoCycles(m: PipelineManifest): Seq[String] = {
    val adjacency = m.spec.steps.map(s => s.name -> s.dependsOn).toMap
    val colour = scala.collection.mutable.Map.empty[String, Int] // 0 white 1 gray 2 black
    adjacency.keys.foreach(colour(_) = 0)
    val errors = Vector.newBuilder[String]
    def dfs(root: String): Unit = {
      // frames: (node, next child index); colour set to gray on push,
      // black on pop — identical visit order to the recursive form
      val stack = scala.collection.mutable.Stack[(String, Int)]()
      colour(root) = 1
      stack.push((root, 0))
      while (stack.nonEmpty) {
        val (node, ci) = stack.pop()
        val children = adjacency.getOrElse(node, Vector.empty)
        if (ci < children.length) {
          stack.push((node, ci + 1))
          val n = children(ci)
          colour.get(n) match {
            case Some(1) => errors += s"Cycle detected involving step '$node' -> '$n'."
            case Some(0) => colour(n) = 1; stack.push((n, 0))
            case _ => ()
          }
        } else colour(node) = 2
      }
    }
    m.spec.steps.map(_.name).foreach(n => if (colour(n) == 0) dfs(n))
    errors.result()
  }

  // ---- env expansion (env_expander.py) -----------------------------------

  /** `{CLASSNAME_UPPER}__KEY` (expand_step_settings). */
  def expandStepSettings(className: String, settings: VectorMap[String, String]): VectorMap[String, String] =
    settings.map { case (k, v) => s"${className.toUpperCase}__$k" -> v }

  /** `{MIDDLEWARENAME_UPPER}__KEY` (expand_middleware_settings). */
  def expandMiddlewareSettings(name: String, settings: VectorMap[String, String]): VectorMap[String, String] =
    settings.map { case (k, v) => s"${name.toUpperCase}__$k" -> v }

  /** `MIDDLEWARES=name1,name2` (expand_middlewares_list). */
  def expandMiddlewaresList(names: Seq[String]): VectorMap[String, String] =
    VectorMap("MIDDLEWARES" -> names.mkString(","))

  /** The full environment a manifest describes: every step's settings under
    * its class-name prefix, every middleware's under its name prefix, plus
    * the ordered MIDDLEWARES list (what the reference's executor exports
    * for pydantic-settings consumption). */
  def environment(m: PipelineManifest): VectorMap[String, String] = {
    val stepEnv = m.spec.steps.map(s => expandStepSettings(s.simpleClassName, s.settings))
    val mwEnv = m.spec.middlewares.map(w => expandMiddlewareSettings(w.name, w.settings))
    val mwList =
      if (m.spec.middlewares.isEmpty) VectorMap.empty[String, String]
      else expandMiddlewaresList(m.spec.middlewares.map(_.name))
    (stepEnv ++ mwEnv :+ mwList).foldLeft(VectorMap.empty[String, String])(_ ++ _)
  }

  // ---- secret placeholders (secrets/placeholder.py) -----------------------

  private val PlaceholderRe = """^\$\{secret:([^:}]+):([^}]+)\}$""".r

  def parsePlaceholder(value: String): Option[SecretRef] = value match {
    case PlaceholderRe(p, r) => Some(SecretRef(p, r))
    case _ => None
  }

  def findPlaceholderVars(env: VectorMap[String, String]): VectorMap[String, SecretRef] =
    env.flatMap { case (k, v) => parsePlaceholder(v).map(k -> _) }

  /** Substitute placeholders through a provider-name -> resolver map (the
    * SecretProvider registry seam). Unknown providers fail fast — a
    * manifest that names a vault the deployment doesn't have is a config
    * error, not a value. */
  def resolveSecrets(env: VectorMap[String, String],
                     providers: Map[String, String => String]): VectorMap[String, String] =
    env.map { case (k, v) =>
      parsePlaceholder(v) match {
        case Some(SecretRef(p, r)) =>
          val resolver = providers.getOrElse(p,
            throw new IllegalArgumentException(
              s"no secret provider '$p' registered (needed by $k); have: ${providers.keys.toSeq.sorted.mkString(", ")}"))
          k -> resolver(r)
        case None => k -> v
      }
    }

  // ---- builder (builder.py) ----------------------------------------------

  /** Default class-path registry: the reference step classes with a
    * settings-constructible engine analog. Callers merge their own
    * factories keyed by manifest `class` (full path or simple name). */
  val defaultRegistry: Map[String, ManifestStep => Step] = Map(
    "DropDuplicationStep" -> (s => DropDuplicationStep(
      s.settings.getOrElse("DROP_BY_FIELDS", "md").split(',').toSeq.map(_.trim))),
    "UrlFilterStep" -> (s => UrlFilterStep(
      s.settings.getOrElse("URL_FRAGMENT", ""),
      s.settings.getOrElse("URL_COL", "url"))),
    "DeterministicSortStep" -> (s => DeterministicSortStep(
      s.settings.getOrElse("SORT_BY", "").split(',').toSeq.map(_.trim).filter(_.nonEmpty))))

  private def factoryFor(registry: Map[String, ManifestStep => Step],
                         s: ManifestStep): ManifestStep => Step =
    registry.getOrElse(s.className, registry.getOrElse(s.simpleClassName,
      throw new IllegalArgumentException(
        s"no step factory registered for '${s.className}' (step '${s.name}')")))

  /** Instantiate every step and return them in deterministic topological
    * order (Kahn's algorithm, ready set ordered by manifest position — a
    * valid linearization of builder.py's dependency wiring). Fails fast on
    * validation errors. */
  def buildSteps(m: PipelineManifest,
                 registry: Map[String, ManifestStep => Step] = defaultRegistry): Vector[(ManifestStep, Step)] = {
    val errs = validate(m)
    require(errs.isEmpty, s"invalid manifest: ${errs.mkString("; ")}")
    val byName = m.spec.steps.map(s => s.name -> s).toMap
    val indeg = scala.collection.mutable.Map(m.spec.steps.map(s => s.name -> s.dependsOn.size): _*)
    val dependents = m.spec.steps.flatMap(s => s.dependsOn.map(_ -> s.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val order = Vector.newBuilder[ManifestStep]
    var ready = m.spec.steps.filter(s => indeg(s.name) == 0).map(_.name)
    while (ready.nonEmpty) {
      val n = ready.head
      ready = ready.tail
      order += byName(n)
      dependents.getOrElse(n, Vector.empty).foreach { d =>
        indeg(d) -= 1
        if (indeg(d) == 0) ready = ready :+ d
      }
    }
    order.result().map(s => s -> factoryFor(registry, s)(s))
  }

  /** Steps no other step depends on (builder.py find_terminal_steps). */
  def terminalSteps(m: PipelineManifest): Vector[ManifestStep] = {
    val referenced = m.spec.steps.flatMap(_.dependsOn).toSet
    m.spec.steps.filterNot(s => referenced(s.name))
  }

  /** Compose a CHAIN-shaped manifest (each step at most one dependency,
    * linear order) into the engine's [[Pipeline]]. General DAGs must use
    * [[buildSteps]] — a silent linearization of a diamond would reorder
    * effects, so this fails fast instead. */
  def toPipeline(m: PipelineManifest,
                 registry: Map[String, ManifestStep => Step] = defaultRegistry): Pipeline = {
    require(m.spec.steps.forall(_.dependsOn.size <= 1) && terminalSteps(m).size == 1,
      "manifest is not chain-shaped — use buildSteps for DAGs")
    Pipeline(buildSteps(m, registry).map(_._2))
  }

  // ---- node helpers -------------------------------------------------------

  private def textOr(n: JsonNode, field: String, default: String): String =
    if (n.hasNonNull(field)) n.get(field).asText() else default

  private def strings(n: JsonNode): Vector[String] =
    if (!n.isArray) Vector.empty else n.elements().asScala.map(_.asText()).toVector

  private def stringMap(n: JsonNode): VectorMap[String, String] =
    if (!n.isObject) VectorMap.empty
    else n.properties().asScala.foldLeft(VectorMap.empty[String, String]) { (acc, e) =>
      acc + (e.getKey -> e.getValue.asText())
    }

  private def nestedStringMap(n: JsonNode): VectorMap[String, VectorMap[String, String]] =
    if (!n.isObject) VectorMap.empty
    else n.properties().asScala.foldLeft(VectorMap.empty[String, VectorMap[String, String]]) { (acc, e) =>
      acc + (e.getKey -> stringMap(e.getValue))
    }
}
