"""STAC API thin client — engine twin of the reference's control-plane
surface (``stacbuilder/stacapi/endpoints.py:137-477`` + ``auth.py:1-38``):
collection/item CRUD, ``exists``, ``create_or_update`` and bulk upsert,
built on DEPENDENCY-INJECTED transport exactly like the reference's
``RestApi`` indirection — so the same client runs against a real HTTP
backend (not available in this sandbox) or the in-memory/directory fakes
used in tests.

Transport contract: ``request(method, path, json=None) -> (status, body)``
with ``status`` an int HTTP-style code and ``body`` a decoded JSON value.
The reference's semantics are preserved:

- argument validation raises TypeError/ValueError before any request
  (endpoints.py:192-199,214-222)
- ``exists`` maps 404 -> False, other errors raise (endpoints.py:224-231)
- ``create_or_update`` = exists ? update : create (endpoints.py:271-281)
- ``collection_auth_info`` merged into the collection body on create/update
  (endpoints.py:248-251)
- bulk item upsert POSTs ``{"items": {id: item}, "method": "upsert"}``
  (endpoints.py:416-441); retries live in the data-plane sink
  (``sources/upload.py``), which this module deliberately does not duplicate
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Tuple

Transport = Callable[..., Tuple[int, object]]


from ..exceptions import EngineException, InvalidOperation


class StacApiError(EngineException, RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


def bearer_auth_header(token: Optional[str]) -> Dict[str, str]:
    """Auth indirection (auth.py:14-38): the reference builds a requests
    AuthBase from settings; the engine reduces it to headers the transport
    attaches.  No network -> no OAuth flows; a real deployment plugs its
    token acquisition here."""
    return {"Authorization": f"Bearer {token}"} if token else {}


# --- auth settings -> auth object (stacapi/auth.py:14-38 semantics) ---------


class AuthSettings:
    """Engine twin of the reference's ``AuthSettings`` pydantic model
    (stacapi/config.py:7-14): same fields, same defaults."""

    def __init__(self, enabled: bool = True, interactive: bool = True,
                 authorization_url: Optional[str] = None,
                 token_url: Optional[str] = None,
                 client_id: Optional[str] = None,
                 username: Optional[str] = None,
                 password: Optional[str] = None):
        self.enabled = enabled
        self.interactive = interactive
        self.authorization_url = authorization_url
        self.token_url = token_url
        self.client_id = client_id
        self.username = username
        self.password = password

    @classmethod
    def from_dict(cls, d: dict) -> "AuthSettings":
        return cls(**{k: d[k] for k in (
            "enabled", "interactive", "authorization_url", "token_url",
            "client_id", "username", "password") if k in d})


class _OAuthBase:
    """An auth object = header provider, the engine's reduction of
    requests' ``AuthBase``.  ``token_transport`` is the same injected
    request callable the endpoints use (no network in this sandbox; a real
    deployment passes an HTTP transport) — the token POST goes through it
    and the resulting access token becomes a bearer header, cached until
    ``invalidate``."""

    def __init__(self, token_transport: Transport):
        self._t = token_transport
        self._token: Optional[str] = None

    def _fetch_token(self) -> str:
        raise NotImplementedError

    def invalidate(self) -> None:
        self._token = None

    def headers(self) -> Dict[str, str]:
        if self._token is None:
            self._token = self._fetch_token()
        return bearer_auth_header(self._token)


class OAuthAuthorizationCodePKCE(_OAuthBase):
    """Interactive authorization-code-with-PKCE flow (auth.py:16-22).
    The browser round-trip cannot run headless, so the transport is handed
    the authorization_url and must return the code grant; the token POST
    then redeems it."""

    def __init__(self, token_transport: Transport, authorization_url: str,
                 token_url: str, client_id: Optional[str]):
        super().__init__(token_transport)
        self.authorization_url = authorization_url
        self.token_url = token_url
        self.client_id = client_id

    def _fetch_token(self) -> str:
        status, body = self._t("GET", self.authorization_url,
                               json={"client_id": self.client_id, "flow": "pkce"})
        if status != 200:
            raise StacApiError(status, "authorization code grant failed")
        code = body["code"]
        status, body = self._t("POST", self.token_url,
                               json={"grant_type": "authorization_code",
                                     "code": code, "client_id": self.client_id})
        if status != 200:
            raise StacApiError(status, "token redemption failed")
        return body["access_token"]


class OAuthResourceOwnerPassword(_OAuthBase):
    """Resource-owner password-credentials flow (auth.py:23-31)."""

    def __init__(self, token_transport: Transport, token_url: str,
                 username: str, password: str, client_id: Optional[str]):
        super().__init__(token_transport)
        self.token_url = token_url
        self.username = username
        self.password = password
        self.client_id = client_id

    def _fetch_token(self) -> str:
        status, body = self._t("POST", self.token_url,
                               json={"grant_type": "password",
                                     "username": self.username,
                                     "password": self.password,
                                     "client_id": self.client_id})
        if status != 200:
            raise StacApiError(status, "password-credentials token grant failed")
        return body["access_token"]


def get_auth(auth_settings: Optional[AuthSettings],
             token_transport: Optional[Transport] = None):
    """settings -> auth object or None — the reference's ``get_auth``
    decision tree verbatim (auth.py:14-38): disabled -> None; interactive +
    authorization_url -> authorization-code PKCE; username+password ->
    resource-owner password credentials; otherwise SettingsInvalid."""
    from ..exceptions import SettingsInvalid

    if auth_settings is None or not auth_settings.enabled:
        return None
    if token_transport is None:
        raise SettingsInvalid("auth enabled but no token transport injected")
    if auth_settings.interactive and auth_settings.authorization_url:
        return OAuthAuthorizationCodePKCE(
            token_transport,
            authorization_url=auth_settings.authorization_url,
            token_url=auth_settings.token_url,
            client_id=auth_settings.client_id,
        )
    if auth_settings.username and auth_settings.password:
        return OAuthResourceOwnerPassword(
            token_transport,
            token_url=auth_settings.token_url,
            username=auth_settings.username,
            password=auth_settings.password,
            client_id=auth_settings.client_id,
        )
    raise SettingsInvalid(
        "Auth not properly configured: either use interactive login or "
        "supply username and password."
    )


def authenticated_transport(transport: Transport, auth) -> Transport:
    """Wrap a transport so every request carries the auth object's headers
    (the engine's seam for requests' per-request AuthBase injection).  A
    401 invalidates the cached token and retries once with a fresh one."""
    if auth is None:
        return transport

    def request(method: str, path: str, json=None, headers=None):
        h = dict(headers or {})
        h.update(auth.headers())
        status, body = _call_with_headers(transport, method, path, json, h)
        if status == 401:
            auth.invalidate()
            h.update(auth.headers())
            status, body = _call_with_headers(transport, method, path, json, h)
        return status, body

    return request


def _call_with_headers(transport: Transport, method, path, json, headers):
    try:
        return transport(method, path, json=json, headers=headers)
    except TypeError:
        # header-unaware transports (e.g. MemoryTransport) still work —
        # auth headers are then a no-op, exactly like an open test server
        return transport(method, path, json=json)


class MemoryTransport:
    """In-memory STAC API fake implementing the endpoint routes the client
    uses — the engine's stand-in for ``requests`` + a live server."""

    def __init__(self):
        self.collections: Dict[str, dict] = {}
        self.items: Dict[str, Dict[str, dict]] = {}

    def request(self, method: str, path: str, json=None) -> Tuple[int, object]:
        parts = [p for p in path.split("/") if p]
        if parts[0] != "collections":
            return 404, {"error": "unknown route"}
        if len(parts) == 1:
            if method == "GET":
                return 200, {"collections": list(self.collections.values())}
            if method == "POST":
                cid = json["id"]
                if cid in self.collections:
                    return 409, {"error": "exists"}
                self.collections[cid] = json
                return 201, json
        cid = parts[1]
        if len(parts) == 2:
            if method == "GET":
                return (200, self.collections[cid]) if cid in self.collections else (404, {})
            if method == "PUT":
                if cid not in self.collections:
                    return 404, {}
                self.collections[cid] = json
                return 200, json
            if method == "DELETE":
                if cid not in self.collections:
                    return 404, {}
                del self.collections[cid]
                self.items.pop(cid, None)
                return 204, None
        if len(parts) >= 3 and parts[2] == "bulk_items" and method == "POST":
            if cid not in self.collections:
                return 404, {}
            self.items.setdefault(cid, {}).update(json["items"])
            return 200, {"upserted": len(json["items"])}
        if len(parts) >= 3 and parts[2] == "items":
            store = self.items.setdefault(cid, {})
            if len(parts) == 3 and method == "POST":
                iid = json["id"]
                if iid in store:
                    return 409, {"error": "exists"}
                store[iid] = json
                return 201, json
            if len(parts) == 4:
                iid = parts[3]
                if method == "GET":
                    return (200, store[iid]) if iid in store else (404, {})
                if method == "PUT":
                    if iid not in store:
                        return 404, {}
                    store[iid] = json
                    return 200, json
                if method == "DELETE":
                    if iid not in store:
                        return 404, {}
                    del store[iid]
                    return 204, None
        return 405, {"error": "unsupported"}


def _check_id(value: str, name: str) -> None:
    if not isinstance(value, str):
        raise TypeError(f"Argument {name!r} must be of type str, got {type(value)}")
    if value == "":
        raise ValueError(f"Argument {name!r} must not be empty")


class CollectionsEndpoint:
    """endpoints.py:137-314 semantics over the injected transport."""

    def __init__(self, transport: Transport, collection_auth_info: Optional[dict] = None):
        self._t = transport
        self._auth_info = collection_auth_info or None

    def get_all(self) -> List[dict]:
        status, body = self._t("GET", "collections")
        if status != 200:
            raise StacApiError(status, "get_all failed")
        return body["collections"]

    def get(self, collection_id: str) -> dict:
        _check_id(collection_id, "collection_id")
        status, body = self._t("GET", f"collections/{collection_id}")
        if status != 200:
            raise StacApiError(status, f"collection {collection_id} not found")
        return body

    def exists(self, collection_id: str) -> bool:
        _check_id(collection_id, "collection_id")
        status, _ = self._t("GET", f"collections/{collection_id}")
        if status == 404:  # the one expected error (endpoints.py:224-231)
            return False
        if status != 200:
            raise StacApiError(status, "exists check failed")
        return True

    def _body(self, collection: dict) -> dict:
        if not isinstance(collection, dict):
            raise TypeError(f"collection must be a dict, got {type(collection)}")
        body = dict(collection)
        if self._auth_info:  # endpoints.py:248-251
            body.update(self._auth_info)
        return body

    def create(self, collection: dict) -> dict:
        status, body = self._t("POST", "collections", json=self._body(collection))
        if status not in (200, 201):
            raise StacApiError(status, "create failed")
        return body

    def update(self, collection: dict) -> dict:
        status, body = self._t("PUT", f"collections/{collection['id']}", json=self._body(collection))
        if status != 200:
            raise StacApiError(status, "update failed")
        return body

    def create_or_update(self, collection: dict) -> dict:
        # endpoints.py:271-281
        if self.exists(collection["id"]):
            return self.update(collection)
        return self.create(collection)

    def delete_by_id(self, collection_id: str) -> None:
        _check_id(collection_id, "collection_id")
        status, _ = self._t("DELETE", f"collections/{collection_id}")
        if status not in (200, 204):
            raise StacApiError(status, "delete failed")


class ItemsEndpoint:
    """endpoints.py:317-477 semantics (incl. bulk upsert :416-441)."""

    def __init__(self, transport: Transport):
        self._t = transport

    def get(self, collection_id: str, item_id: str) -> dict:
        _check_id(collection_id, "collection_id")
        _check_id(item_id, "item_id")
        status, body = self._t("GET", f"collections/{collection_id}/items/{item_id}")
        if status != 200:
            raise StacApiError(status, f"item {item_id} not found")
        return body

    def exists(self, collection_id: str, item_id: str) -> bool:
        _check_id(collection_id, "collection_id")
        _check_id(item_id, "item_id")
        status, _ = self._t("GET", f"collections/{collection_id}/items/{item_id}")
        if status == 404:
            return False
        if status != 200:
            raise StacApiError(status, "exists check failed")
        return True

    def create(self, collection_id: str, item: dict) -> dict:
        status, body = self._t("POST", f"collections/{collection_id}/items", json=item)
        if status not in (200, 201):
            raise StacApiError(status, "create failed")
        return body

    def update(self, collection_id: str, item: dict) -> dict:
        status, body = self._t("PUT", f"collections/{collection_id}/items/{item['id']}", json=item)
        if status != 200:
            raise StacApiError(status, "update failed")
        return body

    def create_or_update(self, collection_id: str, item: dict) -> dict:
        if self.exists(collection_id, item["id"]):
            return self.update(collection_id, item)
        return self.create(collection_id, item)

    def delete_by_id(self, collection_id: str, item_id: str) -> None:
        _check_id(collection_id, "collection_id")
        _check_id(item_id, "item_id")
        status, _ = self._t("DELETE", f"collections/{collection_id}/items/{item_id}")
        if status not in (200, 204):
            raise StacApiError(status, "delete failed")

    def ingest_bulk(self, collection_id: str, items: List[dict]) -> dict:
        """Bulk upsert (endpoints.py:416-441): keyed by item id, method
        'upsert'.  Items must all belong to ``collection_id``."""
        for it in items:
            if it.get("collection") not in (None, collection_id):
                # typed like the reference (endpoints.py:456-472 InvalidOperation)
                raise InvalidOperation(
                    f"bulk contains item of collection {it.get('collection')!r}, expected {collection_id!r}"
                )
        payload = {"items": {it["id"]: it for it in items}, "method": "upsert"}
        status, body = self._t("POST", f"collections/{collection_id}/bulk_items", json=payload)
        if status != 200:
            raise StacApiError(status, "bulk upsert failed")
        return body


def upload_collection_tree(collection_file: str, transport: Transport,
                           bulk_size: int = 20,
                           collection_auth_info: Optional[dict] = None) -> Dict:
    """Control-plane companion of the data-plane sink: create_or_update the
    collection, then bulk-upsert its linked items (the reference's
    ``upload_collection_and_items``, upload.py:105-157)."""
    colls = CollectionsEndpoint(transport, collection_auth_info)
    items_ep = ItemsEndpoint(transport)
    doc = json.load(open(collection_file))
    colls.create_or_update(doc)
    base = os.path.dirname(os.path.abspath(collection_file))
    bulk: List[dict] = []
    n = 0
    for link in doc.get("links", []):
        if link.get("rel") != "item":
            continue
        item = json.load(open(os.path.normpath(os.path.join(base, link["href"]))))
        bulk.append(item)
        if len(bulk) >= bulk_size:
            items_ep.ingest_bulk(doc["id"], bulk)
            n += len(bulk)
            bulk = []
    if bulk:
        items_ep.ingest_bulk(doc["id"], bulk)
        n += len(bulk)
    return {"collection_id": doc["id"], "n_items_upserted": n}
