package graft.core

/** Pluggable secret resolution for config values (reference
  * src/settings.py:27-47 — `resolve_secrets` routes designated settings
  * through aws/azure/gcp secret-manager helpers before the config object
  * is built).
  *
  * Re-expressed as a value-shaped seam instead of a field-name mapping:
  * any config value of the form `secret://<scheme>/<ref>` resolves through
  * the resolver registered for `<scheme>` at load time, so which settings
  * are secret-backed is a deployment decision (set the env var to a
  * secret URI), not a code change. Resolution happens ONCE in
  * [[GraftConfig.load]], never at use sites — downstream code only ever
  * sees the resolved value.
  *
  * Offline default: the `env` scheme (`secret://env/NAME` reads the
  * variable NAME from the same environment map the config loads from) —
  * the indirection a container injects secrets with. Cloud deployments
  * register their managers at startup:
  * `Secrets.register("aws", ref => <SecretsManager lookup>)`. An
  * unregistered scheme fails loudly at LOAD time with the registration
  * hint — a typo'd scheme must never flow a literal `secret://...` string
  * into a DB password field (the same fail-fast contract as
  * CloudCredentials.missingConnectorHint).
  */
object Secrets {
  /** ref -> secret value; resolvers throw with an actionable message when
    * the ref does not exist.
    */
  type Resolver = String => String

  private val SecretUri = "^secret://([^/]+)/(.+)$".r

  private val resolvers =
    scala.collection.concurrent.TrieMap.empty[String, Resolver]

  def register(scheme: String, resolver: Resolver): Unit =
    resolvers.put(scheme, resolver)

  /** Remove a registered resolver; a removed `env` falls back to the
    * built-in environment-map handler.
    */
  def unregister(scheme: String): Unit =
    resolvers.remove(scheme)

  /** Resolve `value` if it is a `secret://` URI; pass anything else
    * through untouched. `env` is the environment map the caller loads
    * config from (injected for testability, like [[GraftConfig.load]]).
    */
  def resolve(value: String, env: Map[String, String] = sys.env): String =
    value match {
      // Registered resolvers take precedence over the built-in `env`
      // handler, so Secrets.register("env", ...) overrides rather than
      // being silently shadowed.
      case SecretUri(scheme, ref) =>
        resolvers.get(scheme) match {
          case Some(r) => r(ref)
          case None if scheme == "env" =>
            env.getOrElse(ref, throw new IllegalArgumentException(
              s"secret://env/$ref: environment variable $ref is not set"))
          case None => throw new IllegalArgumentException(
            s"secret://$scheme/$ref: no resolver registered for scheme " +
              s"'$scheme'. Register one at startup: " +
              s"""Secrets.register("$scheme", ref => <secret-manager lookup>)""")
        }
      case _ => value
    }
}
