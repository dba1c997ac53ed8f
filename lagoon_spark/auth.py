"""Pluggable authentication providers for the REST facade.

Mirrors the reference's AuthProvider seam
(`server/src/Lagoon/Server/Auth/VerifyCreds.hs:46-60`): a provider is
a NAME plus a ``verify(Credentials) -> LoginResult`` function, where a
login either succeeds, fails with *invalid credentials*, or fails with
a *server error* (directory unreachable, bad template) — the reference
distinguishes the two failures on the wire (`Lagoon.Auth`
LoginInvalidCreds vs LoginServerError) and so does the facade here
(403 vs 502).

Concrete providers, mirroring `Server/Auth/`:

* :func:`file_provider` — htpasswd-style ``user:password`` lines (the
  `--auth-file` mode, BasicAuth.hs's shape);
* :func:`ldap_provider` — LDAP simple bind
  (`Server/Auth/LDAP.hs:29-52`): a distinguished-name TEMPLATE is
  substituted with the login name and bound against the directory.
  The actual bind is an injected callable because no LDAP client
  library ships in this environment; :class:`StubDirectory` provides
  the in-memory directory used by the tests, and a real deployment
  passes ``bind=`` backed by ldap3/python-ldap without touching the
  provider logic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


class LoginOk:
    """Successful verification."""


class LoginInvalidCreds:
    """The directory/file rejected the credentials (`LoginInvalidCreds`)."""


@dataclass
class LoginServerError:
    """The provider itself failed (`LoginServerError`) — bad template,
    unreachable directory — NOT a wrong password."""

    message: str


@dataclass
class AuthProvider:
    """`VerifyCreds.hs:46-51` authProvider: a name + a verifier."""

    name: str
    verify: Callable[[str, str], object]  # -> LoginOk/LoginInvalidCreds/LoginServerError

    def __call__(self, user: str, password: str):
        return self.verify(user, password)


def file_provider(path: str, name: str = "authProviderFile") -> AuthProvider:
    """``user:password`` per line, ``#`` comments — the --auth-file
    format, re-read per login so edits apply without a restart."""

    def verify(user: str, password: str):
        try:
            table = {}
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line and not line.startswith("#"):
                        u, _, pw = line.partition(":")
                        table[u] = pw
        except OSError as e:
            return LoginServerError(f"auth file unreadable: {e}")
        if table.get(user) == password and password is not None:
            return LoginOk()
        return LoginInvalidCreds()

    return AuthProvider(name, verify)


class InvalidCredentials(Exception):
    """Raised by a bind callable for a wrong DN/password (the LDAP
    LdapInvalidCredentials result code)."""


class StubDirectory:
    """An in-memory 'LDAP server': DN -> password. Its :meth:`bind`
    matches the injected-bind signature, so the tests exercise the
    full provider path (template substitution, error taxonomy) with no
    network or client library."""

    def __init__(self, entries: dict[str, str]):
        self.entries = dict(entries)
        self.binds: list[tuple[str, str]] = []  # observed (dn, password)

    def bind(self, url: str, dn: str, password: str) -> None:
        self.binds.append((dn, password))
        if self.entries.get(dn) != password:
            raise InvalidCredentials(dn)


def ldap_provider(
    url: str,
    dn_template: str,
    *,
    bind: Callable[[str, str, str], None] | None = None,
    name: str = "authProviderLDAP",
) -> AuthProvider:
    """LDAP simple-bind provider (`Server/Auth/LDAP.hs:29-52`).

    ``dn_template`` names the bind DN with the login substituted for
    ``{{user}}`` (the reference's mustache template; plain ``{user}``
    is accepted too), e.g. ``uid={{user}},ou=people,dc=example,dc=org``.
    A template without a user slot is a configuration error and
    reports LoginServerError — the reference likewise maps a bad
    template to a server error, never to invalid credentials.

    ``bind(url, dn, password)`` performs the simple bind: return on
    success, raise :class:`InvalidCredentials` for a wrong password,
    raise anything else for a directory failure. The default tries the
    ``ldap3`` client if installed and reports a server error
    otherwise."""

    def default_bind(u: str, dn: str, password: str) -> None:
        try:
            import ldap3  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "no LDAP client library installed; pass bind= (see "
                "StubDirectory for the test shape)"
            ) from e
        server = ldap3.Server(u)
        conn = ldap3.Connection(server, user=dn, password=password)
        if not conn.bind():
            raise InvalidCredentials(dn)
        conn.unbind()

    do_bind = bind or default_bind

    def verify(user: str, password: str):
        if "{{user}}" not in dn_template and "{user}" not in dn_template:
            return LoginServerError(
                f"invalid LDAP template (no user slot): {dn_template!r}"
            )
        dn = dn_template.replace("{{user}}", user).replace("{user}", user)
        try:
            do_bind(url, dn, password)
        except InvalidCredentials:
            return LoginInvalidCreds()
        except Exception as e:  # unreachable directory, missing client, ...
            return LoginServerError(str(e))
        return LoginOk()

    return AuthProvider(name, verify)
