"""OIDC login for the dashboard + signed session cookies.

Covers the reference's OIDC integration (config OIDCConfig
config/config.go:415-421; provider/verifier setup master/master.go:402-418;
/login and /callback/oauth2 handlers master/rest.go:271-273,369-418; secure
session cookies via gorilla/securecookie master/rest.go:285-287):

- ``OIDCClient``: OpenID Connect discovery, authorization-code flow, and
  RS256 id_token verification against the provider's JWKS (the go-oidc
  verifier analog) — stdlib HTTP + ``cryptography`` only.
- ``SessionManager``: HMAC-signed session cookie values with expiry (the
  securecookie analog; key generated per process like GenerateRandomKey).
- ``MockOIDCProvider``: in-process issuer implementing discovery, /auth,
  /token and JWKS, signing real RS256 id_tokens — the test backend, in the
  spirit of the reference's fake OpenAI server (common/mock/openai.go).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import secrets
import threading
import time
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


# --------------------------------------------------------------------------
# session cookies


class SessionManager:
    """HMAC-signed session values (reference: securecookie, master/rest.go:285)."""

    COOKIE = "gorse_session"

    def __init__(self, ttl: float = 3600.0, secret: bytes | None = None) -> None:
        self._secret = secret or secrets.token_bytes(32)
        self._ttl = ttl

    def issue(self, user_info: dict) -> str:
        payload = _b64url(
            json.dumps({"u": user_info, "exp": time.time() + self._ttl}).encode()
        )
        sig = _b64url(hmac.new(self._secret, payload.encode(), hashlib.sha256).digest())
        return f"{payload}.{sig}"

    def verify(self, token: str) -> dict | None:
        """Returns the user-info dict, or None when invalid/expired."""
        try:
            payload, sig = token.split(".", 1)
            want = _b64url(hmac.new(self._secret, payload.encode(), hashlib.sha256).digest())
            if not hmac.compare_digest(sig, want):
                return None
            data = json.loads(_b64url_decode(payload))
            if data["exp"] < time.time():
                return None
            return data["u"]
        except (ValueError, KeyError):
            return None

    def from_cookie_header(self, cookie_header: str | None) -> dict | None:
        if not cookie_header:
            return None
        for part in cookie_header.split(";"):
            name, _, value = part.strip().partition("=")
            if name == self.COOKIE:
                return self.verify(value)
        return None


# --------------------------------------------------------------------------
# OIDC relying party


class OIDCClient:
    """Authorization-code flow client (reference: master/master.go:402-418)."""

    def __init__(self, issuer: str, client_id: str, client_secret: str, redirect_url: str) -> None:
        self.issuer = issuer.rstrip("/")
        self.client_id = client_id
        self.client_secret = client_secret
        self.redirect_url = redirect_url
        self._discovery: dict | None = None
        self._jwks: dict | None = None
        self._states: dict[str, float] = {}
        self._lock = threading.Lock()

    def _get_json(self, url: str) -> dict:
        with urllib.request.urlopen(url, timeout=10) as resp:
            return json.loads(resp.read().decode())

    @property
    def discovery(self) -> dict:
        if self._discovery is None:
            self._discovery = self._get_json(
                self.issuer + "/.well-known/openid-configuration"
            )
        return self._discovery

    def new_state(self) -> str:
        """CSRF state nonce, valid for 10 minutes."""
        state = secrets.token_urlsafe(16)
        with self._lock:
            now = time.time()
            self._states = {s: t for s, t in self._states.items() if now - t < 600}
            self._states[state] = now
        return state

    def check_state(self, state: str) -> bool:
        with self._lock:
            return self._states.pop(state, None) is not None

    def auth_url(self, state: str) -> str:
        q = urllib.parse.urlencode(
            {
                "response_type": "code",
                "client_id": self.client_id,
                "redirect_uri": self.redirect_url,
                "scope": "openid profile email",
                "state": state,
            }
        )
        return f"{self.discovery['authorization_endpoint']}?{q}"

    def exchange(self, code: str) -> dict:
        """Exchange an authorization code; returns verified id_token claims."""
        body = urllib.parse.urlencode(
            {
                "grant_type": "authorization_code",
                "code": code,
                "redirect_uri": self.redirect_url,
                "client_id": self.client_id,
                "client_secret": self.client_secret,
            }
        ).encode()
        req = urllib.request.Request(
            self.discovery["token_endpoint"],
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            tokens = json.loads(resp.read().decode())
        return self.verify_id_token(tokens["id_token"])

    # --- id_token verification (the oidc.Verifier analog)

    def _key_for(self, kid: str | None):
        from cryptography.hazmat.primitives.asymmetric import rsa

        if self._jwks is None:
            self._jwks = self._get_json(self.discovery["jwks_uri"])
        for jwk in self._jwks.get("keys", []):
            if kid is not None and jwk.get("kid") != kid:
                continue
            n = int.from_bytes(_b64url_decode(jwk["n"]), "big")
            e = int.from_bytes(_b64url_decode(jwk["e"]), "big")
            return rsa.RSAPublicNumbers(e, n).public_key()
        raise ValueError(f"no JWKS key matching kid={kid!r}")

    def verify_id_token(self, token: str) -> dict:
        from cryptography.exceptions import InvalidSignature
        from cryptography.hazmat.primitives import hashes
        from cryptography.hazmat.primitives.asymmetric import padding

        header_b64, payload_b64, sig_b64 = token.split(".")
        header = json.loads(_b64url_decode(header_b64))
        if header.get("alg") != "RS256":
            raise ValueError(f"unsupported id_token alg {header.get('alg')!r}")
        key = self._key_for(header.get("kid"))
        try:
            key.verify(
                _b64url_decode(sig_b64),
                f"{header_b64}.{payload_b64}".encode(),
                padding.PKCS1v15(),
                hashes.SHA256(),
            )
        except InvalidSignature:
            raise ValueError("invalid id_token signature")
        claims = json.loads(_b64url_decode(payload_b64))
        if claims.get("iss", "").rstrip("/") != self.issuer:
            raise ValueError(f"issuer mismatch: {claims.get('iss')!r}")
        aud = claims.get("aud")
        if self.client_id not in (aud if isinstance(aud, list) else [aud]):
            raise ValueError("audience mismatch")
        if claims.get("exp", 0) < time.time():
            raise ValueError("id_token expired")
        return claims


# --------------------------------------------------------------------------
# mock provider (test backend)


class MockOIDCProvider:
    """In-process OIDC issuer signing real RS256 id_tokens."""

    def __init__(self, client_id: str = "gorse", client_secret: str = "secret",
                 user: dict | None = None, host: str = "127.0.0.1", port: int = 0) -> None:
        from cryptography.hazmat.primitives.asymmetric import rsa

        self.client_id = client_id
        self.client_secret = client_secret
        self.user = user or {"sub": "u-test", "name": "Test User", "email": "test@example.com"}
        self._key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        self._codes: dict[str, dict] = {}
        provider = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _json(self, payload: dict, status: int = 200) -> None:
                body = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path == "/.well-known/openid-configuration":
                    self._json(provider.discovery())
                elif parsed.path == "/keys":
                    self._json(provider.jwks())
                elif parsed.path == "/auth":
                    # auto-approve: immediately redirect back with a code
                    q = dict(urllib.parse.parse_qsl(parsed.query))
                    code = secrets.token_urlsafe(12)
                    provider._codes[code] = {"redirect_uri": q.get("redirect_uri", "")}
                    target = (
                        q["redirect_uri"]
                        + "?"
                        + urllib.parse.urlencode({"code": code, "state": q.get("state", "")})
                    )
                    self.send_response(302)
                    self.send_header("Location", target)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                else:
                    self._json({"error": "not found"}, 404)

            def do_POST(self):
                length = int(self.headers.get("Content-Length") or 0)
                form = dict(urllib.parse.parse_qsl(self.rfile.read(length).decode()))
                if urllib.parse.urlparse(self.path).path != "/token":
                    self._json({"error": "not found"}, 404)
                    return
                if form.get("client_secret") != provider.client_secret:
                    self._json({"error": "invalid_client"}, 401)
                    return
                if form.get("code") not in provider._codes:
                    self._json({"error": "invalid_grant"}, 400)
                    return
                del provider._codes[form["code"]]
                self._json(
                    {
                        "access_token": secrets.token_urlsafe(12),
                        "token_type": "Bearer",
                        "id_token": provider.sign_id_token(),
                    }
                )

        class Server(ThreadingHTTPServer):
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.issuer = f"http://{self._server.server_address[0]}:{self._server.server_address[1]}"
        threading.Thread(target=self._server.serve_forever, daemon=True).start()

    def discovery(self) -> dict:
        return {
            "issuer": self.issuer,
            "authorization_endpoint": self.issuer + "/auth",
            "token_endpoint": self.issuer + "/token",
            "jwks_uri": self.issuer + "/keys",
            "id_token_signing_alg_values_supported": ["RS256"],
        }

    def jwks(self) -> dict:
        pub = self._key.public_key().public_numbers()
        n = pub.n.to_bytes((pub.n.bit_length() + 7) // 8, "big")
        e = pub.e.to_bytes((pub.e.bit_length() + 7) // 8, "big")
        return {
            "keys": [
                {"kty": "RSA", "alg": "RS256", "use": "sig", "kid": "mock-1",
                 "n": _b64url(n), "e": _b64url(e)}
            ]
        }

    def sign_id_token(self) -> str:
        from cryptography.hazmat.primitives import hashes
        from cryptography.hazmat.primitives.asymmetric import padding

        header = _b64url(json.dumps({"alg": "RS256", "kid": "mock-1", "typ": "JWT"}).encode())
        now = time.time()
        claims = dict(self.user)
        claims.update({"iss": self.issuer, "aud": self.client_id, "iat": now, "exp": now + 3600})
        payload = _b64url(json.dumps(claims).encode())
        sig = self._key.sign(
            f"{header}.{payload}".encode(), padding.PKCS1v15(), hashes.SHA256()
        )
        return f"{header}.{payload}.{_b64url(sig)}"

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
