"""Mutual-TLS credentials for the gRPC control plane.

Covers the reference's common/util/tls.go: both server and client load a CA
bundle plus their own certificate/key pair; the server requires client
certificates (`RequireClientCert: true`), so in-cluster traffic is mutually
authenticated. Enabled by `[master] ssl_mode/ssl_ca/ssl_cert/ssl_key`
(reference config/config.go:141-145).

Also provides a self-signed test-CA generator (openssl CLI) used by the test
suite — the analog of the certificates the reference's deployments provision.
"""

from __future__ import annotations

import dataclasses
import subprocess
from pathlib import Path

_GRPC_OPTIONS = [("grpc.max_receive_message_length", 512 * 1024 * 1024)]


@dataclasses.dataclass
class TLSConfig:
    """Reference: util.TLSConfig (common/util/tls.go:26-30)."""

    ssl_ca: str
    ssl_cert: str
    ssl_key: str

    def _read(self, path: str) -> bytes:
        return Path(path).read_bytes()

    def server_credentials(self):
        """Mutual-TLS server creds (util.NewServerCreds: require client cert)."""
        import grpc

        return grpc.ssl_server_credentials(
            [(self._read(self.ssl_key), self._read(self.ssl_cert))],
            root_certificates=self._read(self.ssl_ca),
            require_client_auth=True,
        )

    def channel_credentials(self):
        """Client creds presenting our certificate (util.NewClientCreds)."""
        import grpc

        return grpc.ssl_channel_credentials(
            root_certificates=self._read(self.ssl_ca),
            private_key=self._read(self.ssl_key),
            certificate_chain=self._read(self.ssl_cert),
        )


def make_channel(target: str, tls: TLSConfig | None = None):
    """Open a gRPC channel, secure when a TLSConfig is given."""
    import grpc

    if tls is None:
        return grpc.insecure_channel(target, options=_GRPC_OPTIONS)
    return grpc.secure_channel(target, tls.channel_credentials(), options=_GRPC_OPTIONS)


def bind_port(server, address: str, tls: TLSConfig | None = None) -> int:
    """Bind a grpc.Server port, secure when a TLSConfig is given."""
    if tls is None:
        return server.add_insecure_port(address)
    return server.add_secure_port(address, tls.server_credentials())


def generate_test_certs(directory: str | Path, cn: str = "localhost") -> tuple[TLSConfig, TLSConfig]:
    """Create a throwaway CA plus server and client certs via the openssl CLI.

    Returns (server_tls, client_tls). Test-only: mirrors the mTLS material a
    reference deployment provisions out-of-band.
    """
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)

    def run(*args: str) -> None:
        subprocess.run(["openssl", *args], check=True, capture_output=True, cwd=d)

    run("req", "-x509", "-newkey", "rsa:2048", "-nodes", "-days", "2",
        "-keyout", "ca.key", "-out", "ca.pem", "-subj", "/CN=gorse-tpu-test-ca")
    for name in ("server", "client"):
        run("req", "-newkey", "rsa:2048", "-nodes",
            "-keyout", f"{name}.key", "-out", f"{name}.csr", "-subj", f"/CN={cn}")
        # SAN extension is required by modern TLS stacks for hostname checks
        ext = d / f"{name}.ext"
        ext.write_text(f"subjectAltName=DNS:{cn},IP:127.0.0.1\n")
        run("x509", "-req", "-in", f"{name}.csr", "-CA", "ca.pem", "-CAkey", "ca.key",
            "-CAcreateserial", "-days", "2", "-out", f"{name}.pem",
            "-extfile", str(ext))
    server = TLSConfig(str(d / "ca.pem"), str(d / "server.pem"), str(d / "server.key"))
    client = TLSConfig(str(d / "ca.pem"), str(d / "client.pem"), str(d / "client.key"))
    return server, client
