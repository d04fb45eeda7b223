package graft.auth

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Token source for the engine's outbound HTTP clients — the auth seam
  * the reference drives through Secret Manager → LF client credentials
  * (`/root/reference/utils.py:78-92` `get_secret('LF_CREDENTIALS')` →
  * `lfapi.Auth(client_id, client_secret)`) on the extract side and
  * application-default credentials on the BigQuery side. Both reduce to
  * the same wire behavior: every request carries `Authorization:
  * Bearer <token>`. This trait is that behavior's injection point;
  * WHERE the token comes from (a secret manager, a metadata server, an
  * env var) stays behind it.
  *
  * `Serializable` because [[graft.sources.HttpPageClient]] is
  * constructed executor-side inside DSv2 partition readers; the default
  * resolver re-reads its env/file source on each executor rather than
  * shipping a token through the plan.
  */
trait CredentialProvider extends Serializable {
  /** Bearer token for outgoing requests; None = send unauthenticated
    * (a server requiring auth will answer 401, which both clients
    * surface rather than retry — auth failures are not transient).
    */
  def token(): Option[String]
}

object CredentialProvider {

  /** Env/file-backed resolution, checked in order (first hit wins):
    *  1. system property `graft.auth.token` (tests, spark-submit -D)
    *  2. env var `GRAFT_AUTH_TOKEN` (the executor-env deployment path)
    *  3. token file named by system property `graft.auth.tokenFile`
    *     or env var `GRAFT_AUTH_TOKEN_FILE` (the mounted-secret path —
    *     re-read per call so rotated tokens pick up without restart,
    *     the property the reference gets from `versions/latest`)
    *
    * All unset → None → unauthenticated (the offline/test default).
    */
  val resolve: CredentialProvider = new CredentialProvider {
    override def token(): Option[String] =
      sys.props.get("graft.auth.token").map(_.trim).filter(_.nonEmpty)
        .orElse(sys.env.get("GRAFT_AUTH_TOKEN").map(_.trim).filter(_.nonEmpty))
        .orElse {
          sys.props.get("graft.auth.tokenFile")
            .orElse(sys.env.get("GRAFT_AUTH_TOKEN_FILE"))
            .filter(_.nonEmpty)
            .flatMap { path =>
              val p = Paths.get(path)
              if (Files.isReadable(p))
                Some(new String(Files.readAllBytes(p), UTF_8).trim).filter(_.nonEmpty)
              else None
            }
        }
  }

  /** Token file named explicitly (e.g. the DSv2 `tokenFile` option) —
    * the mounted-secret deployment shape, re-read per call so a rotated
    * token picks up without restart. Unlike [[resolve]]'s opportunistic
    * file fallback, an explicitly named file that cannot be read is a
    * configuration error and fails loudly.
    */
  def fromFile(path: String): CredentialProvider = new CredentialProvider {
    override def token(): Option[String] = {
      val p = Paths.get(path)
      if (!Files.isReadable(p))
        throw new IllegalStateException(s"credential token file not readable: $path")
      Some(new String(Files.readAllBytes(p), UTF_8).trim).filter(_.nonEmpty)
    }
  }

  /** Fixed token — constructor injection for tests and embedded use. */
  def static(tok: String): CredentialProvider = new CredentialProvider {
    override def token(): Option[String] = Some(tok)
  }

  /** Never authenticates (explicit opt-out, distinct from "resolver
    * found nothing").
    */
  val none: CredentialProvider = new CredentialProvider {
    override def token(): Option[String] = None
  }
}
