"""HTTP auth header builders for the REST connector edge.

Re-expresses the reference's auth layer (``core/auth.py:8-198``) with
the same kinds and header semantics:

- ``api_key``  → ``{header_name: api_key}``            (auth.py:37-50)
- ``token``    → ``Authorization: <scheme> <token>``    (auth.py:53-66)
- ``bearer``   → ``Authorization: Bearer <token>``      (auth.py:69-80)
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
    for cls in (NoAuth, ApiKeyAuth, TokenAuth, BearerAuth, OAuth2Auth, LoginAuth)
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
        if name in ("self", "transport") or p.kind in (
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
