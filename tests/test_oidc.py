"""Dashboard login tests: password sessions + OIDC single sign-on against an
in-process mock provider (reference analogs: master/rest.go:369-418 login
handlers; the fake-backend test pattern of common/mock)."""

import time
import urllib.error
import urllib.parse
import urllib.request

import pytest

from gorse_tpu.serve.dashboard import MasterRestServer
from gorse_tpu.serve.master import Master
from gorse_tpu.serve.oidc import MockOIDCProvider, OIDCClient, SessionManager
from gorse_tpu.storage import BlobStore, MemoryCacheStore, MemoryDataStore, MetaStore
from gorse_tpu.utils.config import Config


class NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, *args, **kwargs):
        return None


def _get(url, cookie=None, follow=False):
    """GET without following redirects; returns (status, headers, body)."""
    handlers = [] if follow else [NoRedirect()]
    opener = urllib.request.build_opener(*handlers)
    req = urllib.request.Request(url)
    if cookie:
        req.add_header("Cookie", cookie)
    try:
        resp = opener.open(req, timeout=10)
        return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _post_form(url, form):
    req = urllib.request.Request(
        url,
        data=urllib.parse.urlencode(form).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    opener = urllib.request.build_opener(NoRedirect())
    try:
        resp = opener.open(req, timeout=10)
        return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_session_manager_round_trip():
    sm = SessionManager(ttl=60)
    token = sm.issue({"Name": "alice"})
    assert sm.verify(token) == {"Name": "alice"}
    # tampering breaks the signature
    assert sm.verify(token[:-4] + "AAAA") is None
    assert sm.verify("garbage") is None
    # expiry
    sm2 = SessionManager(ttl=-1)
    assert sm2.verify(sm2.issue({"Name": "x"})) is None
    # cookie header parsing
    assert sm.from_cookie_header(f"a=b; {SessionManager.COOKIE}={token}") == {"Name": "alice"}
    assert sm.from_cookie_header(None) is None


def _serve_master(config):
    master = Master(config, MemoryDataStore(), MemoryCacheStore(), BlobStore("/tmp/gtpu_oidc_blobs"), MetaStore())
    rest = MasterRestServer(master)
    httpd = rest.serve("127.0.0.1", 0)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    return rest, httpd, base


def test_password_login_flow():
    config = Config()
    config.master.dashboard_user_name = "admin"
    config.master.dashboard_password = "hunter2"
    rest, httpd, base = _serve_master(config)
    try:
        # admin routes are gated without a session
        status, _, _ = _get(base + "/api/dashboard/stats")
        assert status == 401
        # login form is public
        status, _, body = _get(base + "/login")
        assert status == 200 and b"<form" in body
        # wrong password redirects back to /login
        status, headers, _ = _post_form(base + "/login", {"user_name": "admin", "password": "nope"})
        assert status == 302 and "msg=incorrect" in headers["Location"]
        # correct password sets a session cookie
        status, headers, _ = _post_form(base + "/login", {"user_name": "admin", "password": "hunter2"})
        assert status == 302
        cookie = headers["Set-Cookie"].split(";")[0]
        status, _, _ = _get(base + "/api/dashboard/stats", cookie=cookie)
        assert status == 200
        # userinfo reports the logged-in user
        status, _, body = _get(base + "/api/dashboard/userinfo", cookie=cookie)
        assert status == 200 and b"admin" in body
        # logout clears the cookie
        status, headers, _ = _get(base + "/logout")
        assert status == 302 and "Max-Age=0" in headers["Set-Cookie"]
    finally:
        httpd.shutdown()


@pytest.fixture
def provider():
    p = MockOIDCProvider(client_id="gorse", client_secret="s3cret")
    yield p
    p.close()


def test_oidc_login_flow(provider):
    config = Config()
    config.oidc.enable = True
    config.oidc.issuer = provider.issuer
    config.oidc.client_id = "gorse"
    config.oidc.client_secret = "s3cret"
    rest, httpd, base = _serve_master(config)
    config.oidc.redirect_url = base + "/callback/oauth2"
    rest.oidc.redirect_url = config.oidc.redirect_url
    try:
        # /login redirects to the provider's authorization endpoint
        status, headers, _ = _get(base + "/login")
        assert status == 302
        auth_url = headers["Location"]
        assert auth_url.startswith(provider.issuer + "/auth")
        # provider auto-approves and redirects back with a code
        status, headers, _ = _get(auth_url)
        assert status == 302
        callback_url = headers["Location"]
        assert callback_url.startswith(base + "/callback/oauth2")
        # the callback exchanges the code and sets a session
        status, headers, _ = _get(callback_url)
        assert status == 302
        cookie = headers["Set-Cookie"].split(";")[0]
        status, _, body = _get(base + "/api/dashboard/userinfo", cookie=cookie)
        assert status == 200 and b"test@example.com" in body
        # dashboard is gated without the session
        status, _, _ = _get(base + "/api/dashboard/stats")
        assert status == 401
        status, _, _ = _get(base + "/api/dashboard/stats", cookie=cookie)
        assert status == 200
        # a forged state is rejected
        status, _, _ = _get(base + "/callback/oauth2?code=x&state=forged")
        assert status == 401
    finally:
        httpd.shutdown()


def test_id_token_verification(provider):
    client = OIDCClient(provider.issuer, "gorse", "s3cret", "http://localhost/cb")
    claims = client.verify_id_token(provider.sign_id_token())
    assert claims["email"] == "test@example.com"
    # tampered payload fails signature verification
    header, payload, sig = provider.sign_id_token().split(".")
    import base64, json  # noqa: E401

    fake = base64.urlsafe_b64encode(
        json.dumps({"iss": provider.issuer, "aud": "gorse", "exp": time.time() + 60, "sub": "evil"}).encode()
    ).rstrip(b"=").decode()
    with pytest.raises(ValueError):
        client.verify_id_token(f"{header}.{fake}.{sig}")
    # audience mismatch is rejected
    other = OIDCClient(provider.issuer, "other-client", "s3cret", "http://localhost/cb")
    with pytest.raises(ValueError, match="audience"):
        other.verify_id_token(provider.sign_id_token())
