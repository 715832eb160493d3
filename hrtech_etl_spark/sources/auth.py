"""HTTP auth header builders for the REST connector edge.

Re-expresses the reference's auth layer (``core/auth.py:8-198``) with
the same kinds and header semantics:

- ``api_key``  → ``{header_name: api_key}``            (auth.py:37-50)
- ``token``    → ``Authorization: <scheme> <token>``    (auth.py:53-66)
- ``bearer``   → ``Authorization: Bearer <token>``      (auth.py:69-80)
- ``oauth1``   → RFC 5849 HMAC-SHA1 per-request signing; the
  reference declares the same credential fields but stubs the header
  (``auth.py:82-101``) — here the standard scheme is implemented
- ``oauth2``   → client-credentials POST to token_url, cached
  ``Authorization: Bearer <access_token>``              (auth.py:104-140)
- ``login``    → POST ``{base_url}/login`` with username/password,
  cached ``Authorization: Bearer <session_token>``      (auth.py:142-170)
- ``none``     → no auth headers                        (auth.py:172-179)

``build_headers`` merges auth headers, then static extra headers, then
per-request headers — same precedence as the reference
(``core/auth.py:20-31``). ``build_auth`` is the payload→instance
factory (``core/auth.py:190-223``), keyed by ``auth_type``.

Everything here must stay picklable: auth objects ship to executors
inside the REST DataSource reader, and token caches are populated
per-worker on first use (a driver-fetched token would be stale-prone
over long job lifetimes anyway).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

# A transport is (url, payload) -> parsed-JSON dict. Injectable for
# tests; the default posts form-encoded via requests.
Transport = Callable[[str, Dict[str, Any]], Dict[str, Any]]


def _default_post(url: str, payload: Dict[str, Any]) -> Dict[str, Any]:
    import requests

    resp = requests.post(url, data=payload, timeout=30)
    resp.raise_for_status()
    return resp.json()


def _default_post_json(url: str, payload: Dict[str, Any]) -> Dict[str, Any]:
    import requests

    resp = requests.post(url, json=payload, timeout=30)
    resp.raise_for_status()
    return resp.json()


class BaseAuth:
    kind = "base"

    def __init__(
        self, base_url: str = "", extra_headers: Optional[Dict[str, str]] = None
    ):
        self.base_url = base_url.rstrip("/")
        self._extra_headers = dict(extra_headers or {})

    def as_headers(self) -> Dict[str, str]:
        raise NotImplementedError

    def build_headers(
        self, more: Optional[Dict[str, str]] = None
    ) -> Dict[str, str]:
        headers = dict(self.as_headers())
        headers.update(self._extra_headers)
        if more:
            headers.update(more)
        return headers

    def build_url(self, path: str) -> str:
        return f"{self.base_url}/{path.lstrip('/')}"


class NoAuth(BaseAuth):
    kind = "none"

    def as_headers(self) -> Dict[str, str]:
        return {}


class ApiKeyAuth(BaseAuth):
    kind = "api_key"

    def __init__(
        self,
        base_url: str = "",
        header_name: str = "X-API-Key",
        api_key: str = "",
        extra_headers: Optional[Dict[str, str]] = None,
    ):
        super().__init__(base_url, extra_headers)
        self.header_name = header_name
        self.api_key = api_key

    def as_headers(self) -> Dict[str, str]:
        return {self.header_name: self.api_key}


class TokenAuth(BaseAuth):
    kind = "token"

    def __init__(
        self,
        base_url: str = "",
        token: str = "",
        scheme: str = "Token",
        extra_headers: Optional[Dict[str, str]] = None,
    ):
        super().__init__(base_url, extra_headers)
        self.token = token
        self.scheme = scheme

    def as_headers(self) -> Dict[str, str]:
        return {"Authorization": f"{self.scheme} {self.token}"}


class BearerAuth(TokenAuth):
    kind = "bearer"

    def __init__(
        self,
        base_url: str = "",
        token: str = "",
        extra_headers: Optional[Dict[str, str]] = None,
    ):
        super().__init__(base_url, token, scheme="Bearer", extra_headers=extra_headers)


class OAuth1Auth(BaseAuth):
    """OAuth 1.0a request signing (RFC 5849, HMAC-SHA1).

    The reference declares the same four credential fields
    (``core/auth.py:82-101``) but leaves header construction as a
    placeholder; here the standard scheme is implemented in full:
    per-request signature base string (method & normalized URL &
    sorted-encoded params), HMAC-SHA1 over
    ``consumer_secret&token_secret``, and the ``OAuth ...`` header.

    OAuth1 signatures cover the request method, URL, and parameters,
    so a *static* header cannot exist: :meth:`as_headers` contributes
    nothing, and the REST reader detects :meth:`sign` and calls it per
    request with the final query params (``sources/rest.py``).
    ``timestamp_nonce`` is an injectable ``() -> (timestamp, nonce)``
    for deterministic tests, like ``transport`` on the token flows.
    """

    kind = "oauth1"

    def __init__(
        self,
        base_url: str = "",
        client_key: str = "",
        client_secret: str = "",
        resource_owner_key: str = "",
        resource_owner_secret: str = "",
        extra_headers: Optional[Dict[str, str]] = None,
        timestamp_nonce: Optional[Callable[[], tuple]] = None,
    ):
        super().__init__(base_url, extra_headers)
        self.client_key = client_key
        self.client_secret = client_secret
        self.resource_owner_key = resource_owner_key
        self.resource_owner_secret = resource_owner_secret
        self._timestamp_nonce = timestamp_nonce

    def as_headers(self) -> Dict[str, str]:
        # signatures are request-bound; the static header set is empty
        # (extra_headers still merge via build_headers)
        return {}

    @staticmethod
    def _pct(value: Any) -> str:
        from urllib.parse import quote

        return quote(str(value), safe="-._~")  # RFC 3986 unreserved only

    def sign(
        self,
        method: str,
        url: str,
        params: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, str]:
        """The ``Authorization: OAuth ...`` header for ONE request.

        ``params`` are the query/body parameters the request will
        actually send (list values expand to repeated keys, matching
        urlencode-with-doseq transports like requests).
        """
        import base64
        import hashlib
        import hmac
        import time
        import uuid
        from urllib.parse import parse_qsl, urlsplit, urlunsplit

        if self._timestamp_nonce is not None:
            ts, nonce = self._timestamp_nonce()
        else:
            ts, nonce = str(int(time.time())), uuid.uuid4().hex
        oauth = {
            "oauth_consumer_key": self.client_key,
            "oauth_nonce": nonce,
            "oauth_signature_method": "HMAC-SHA1",
            "oauth_timestamp": ts,
            "oauth_token": self.resource_owner_key,
            "oauth_version": "1.0",
        }
        parts = urlsplit(url)
        netloc = parts.netloc.lower()
        # default ports are excluded from the signature base URL
        if (parts.scheme.lower(), netloc.rpartition(":")[2]) in (
            ("http", "80"),
            ("https", "443"),
        ):
            netloc = netloc.rpartition(":")[0]
        base_url = urlunsplit((parts.scheme.lower(), netloc, parts.path, "", ""))

        pairs: list = list(parse_qsl(parts.query, keep_blank_values=True))
        for k, v in (params or {}).items():
            if isinstance(v, (list, tuple)):
                pairs.extend((k, item) for item in v)
            else:
                pairs.append((k, v))
        pairs.extend(oauth.items())
        norm = "&".join(
            f"{k}={v}"
            for k, v in sorted((self._pct(k), self._pct(v)) for k, v in pairs)
        )
        base = "&".join([method.upper(), self._pct(base_url), self._pct(norm)])
        key = f"{self._pct(self.client_secret)}&{self._pct(self.resource_owner_secret)}"
        sig = base64.b64encode(
            hmac.new(key.encode(), base.encode(), hashlib.sha1).digest()
        ).decode()
        oauth["oauth_signature"] = sig
        header = "OAuth " + ", ".join(
            f'{self._pct(k)}="{self._pct(v)}"' for k, v in sorted(oauth.items())
        )
        return {"Authorization": header}


class OAuth2Auth(BaseAuth):
    """Client-credentials flow: POST grant to ``token_url``, cache the
    access token for the lifetime of this (per-worker) instance."""

    kind = "oauth2"

    def __init__(
        self,
        base_url: str = "",
        client_id: str = "",
        client_secret: str = "",
        token_url: str = "",
        scope: Optional[str] = None,
        extra_headers: Optional[Dict[str, str]] = None,
        transport: Optional[Transport] = None,
    ):
        super().__init__(base_url, extra_headers)
        self.client_id = client_id
        self.client_secret = client_secret
        self.token_url = token_url
        self.scope = scope
        self._access_token: Optional[str] = None
        self._transport = transport

    def _fetch_access_token(self) -> str:
        data = {
            "grant_type": "client_credentials",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
        }
        if self.scope:
            data["scope"] = self.scope
        post = self._transport or _default_post
        return post(self.token_url, data)["access_token"]

    def as_headers(self) -> Dict[str, str]:
        if self._access_token is None:
            self._access_token = self._fetch_access_token()
        return {"Authorization": f"Bearer {self._access_token}"}


class LoginAuth(BaseAuth):
    """Session-login flow: POST credentials to ``{base_url}/login``,
    cache the returned session token."""

    kind = "login"

    def __init__(
        self,
        base_url: str = "",
        username: str = "",
        password: str = "",
        extra_headers: Optional[Dict[str, str]] = None,
        transport: Optional[Transport] = None,
    ):
        super().__init__(base_url, extra_headers)
        self.username = username
        self.password = password
        self._session_token: Optional[str] = None
        self._transport = transport

    def _login(self) -> str:
        post = self._transport or _default_post_json
        data = post(
            f"{self.base_url}/login",
            {"username": self.username, "password": self.password},
        )
        return data["session_token"]

    def as_headers(self) -> Dict[str, str]:
        if self._session_token is None:
            self._session_token = self._login()
        return {"Authorization": f"Bearer {self._session_token}"}


AUTH_KINDS: Dict[str, type[BaseAuth]] = {
    cls.kind: cls
    for cls in (
        NoAuth,
        ApiKeyAuth,
        TokenAuth,
        BearerAuth,
        OAuth1Auth,
        OAuth2Auth,
        LoginAuth,
    )
}


def export_auth_fields(auth_or_cls) -> list:
    """UI field descriptors for an auth kind — the engine counterpart
    of the reference's ``export_auth_fields`` (``core/ui_schema.py:
    107-180``), which introspects a Pydantic auth model; here the
    fields come from the constructor signature (these classes stay
    plain so they pickle to executors).

    Each descriptor is ``{"name", "type", "required", "default"}``.
    ``transport`` (the test-injection hook) is internal and skipped,
    mirroring how the reference skips ``auth_type``. An empty-string
    default is the "caller must supply" sentinel → required with a
    null default.
    """
    import inspect

    cls = auth_or_cls if isinstance(auth_or_cls, type) else type(auth_or_cls)
    if not (isinstance(cls, type) and issubclass(cls, BaseAuth)):
        return []
    fields = []
    for name, p in inspect.signature(cls.__init__).parameters.items():
        if name in ("self", "transport", "timestamp_nonce") or p.kind in (
            inspect.Parameter.VAR_POSITIONAL,
            inspect.Parameter.VAR_KEYWORD,
        ):
            continue
        ann = p.annotation
        type_name = (
            "Any"
            if ann is inspect.Parameter.empty
            else getattr(ann, "__name__", None) or str(ann)
        )
        required = p.default is inspect.Parameter.empty or p.default == ""
        default = None if required else p.default
        fields.append(
            {"name": name, "type": type_name, "required": required, "default": default}
        )
    return fields


def build_auth(payload: Optional[Dict[str, Any]], base_url: str = "") -> BaseAuth:
    """Payload → auth instance (reference ``build_auth_from_payload``,
    ``core/auth.py:201-223``). ``auth_type``/``type`` selects the kind;
    missing/empty payload yields ``NoAuth``."""
    if not payload:
        return NoAuth(base_url)
    payload = dict(payload)
    auth_type = payload.pop("auth_type", None) or payload.pop("type", None) or "none"
    cls = AUTH_KINDS.get(auth_type)
    if cls is None:
        raise ValueError(f"Unknown auth_type: {auth_type!r}")
    payload.setdefault("base_url", base_url)
    return cls(**payload)
