package graft.cdc

import java.net.Socket

import javax.net.ssl.{SSLSocket, SSLSocketFactory}

/** TLS plumbing shared by the native session clients (Kafka SSL /
  * SASL_SSL listeners, PostgreSQL `sslmode` upgrades, MySQL
  * `CLIENT_SSL` upgrades) — pure JSSE, no library.
  *
  * Every path enables HTTPS-style endpoint identification (hostname /
  * SAN verification) and forces the handshake at connect time, so a
  * wrong-host or untrusted certificate fails with the TLS alert rather
  * than on the first protocol read.
  */
object Tls {

  /** Socket factory trusting ONLY the given PKCS12/JKS truststore
    * (the `ssl.truststore.location` / `sslrootcert` contract).
    */
  def socketFactory(truststorePath: String,
      password: String): SSLSocketFactory = {
    val ks = java.security.KeyStore.getInstance(
      new java.io.File(truststorePath), password.toCharArray)
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx.getSocketFactory
  }

  /** System-CA-trusting factory (servers with real certificates). */
  def defaultFactory(): SSLSocketFactory =
    javax.net.ssl.SSLContext.getDefault.getSocketFactory

  private def verifyAndHandshake(s: SSLSocket): SSLSocket = {
    val params = s.getSSLParameters
    params.setEndpointIdentificationAlgorithm("HTTPS")
    s.setSSLParameters(params)
    s.startHandshake()
    s
  }

  /** Fresh TLS connection (implicit-TLS listeners — Kafka SSL). */
  def connect(host: String, port: Int, f: SSLSocketFactory): SSLSocket =
    verifyAndHandshake(
      f.createSocket(host, port).asInstanceOf[SSLSocket])

  /** STARTTLS-style upgrade of an already-open socket (PostgreSQL
    * SSLRequest, MySQL SSLRequest packet): layer TLS over the existing
    * stream after the plaintext negotiation agreed to it.
    */
  def upgrade(socket: Socket, host: String, f: SSLSocketFactory): SSLSocket =
    verifyAndHandshake(
      f.createSocket(socket, host, socket.getPort, true)
        .asInstanceOf[SSLSocket])
}
