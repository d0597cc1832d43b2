"""User authentication registry for the admin web-service API.

Reference contract: ``ArchiveUserDetailsManager.java`` — users live in a
generic data-store table keyed by username with a salted password hash
and a role set (:80-113); the special ``admin`` user ALWAYS resolves,
falling back to a default password of ``admin`` when it has no stored
row (:137-146, :555-575); it can never be created or deleted (:328);
``ROLE_ADMIN`` (:119) gates the mutating admin API routes
(``ApiController.java:532,764`` ``@Secured("ROLE_ADMIN")``), wired over
HTTP Basic by ``web/admin/spring/AdminWebApplication.java:264-275``.

Deviation (documented): the hash is salted PBKDF2-HMAC-SHA256 from the
stdlib instead of BCrypt — same salted adaptive-cost contract, no
external dependency in this container. Persistence reuses the channel
registry's crash-safe parquet swap (``management.recover_atomic_dir`` /
``atomic_swap_dir``): the user table is driver-side dimension metadata,
never a Spark job.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import secrets
import threading
from dataclasses import dataclass, field

from .management import atomic_swap_dir, recover_atomic_dir

#: role string carrying administrative privileges
#: (`ArchiveUserDetailsManager.java:119`)
ROLE_ADMIN = "ADMIN"

#: the special always-existing user (`ArchiveUserDetailsManager.java:137`)
ADMIN_USER_NAME = "admin"

#: the default admin password (`ArchiveUserDetailsManager.java:138`: "The
#: default password hash is for the password 'admin'.")
_DEFAULT_ADMIN_PASSWORD = "admin"

#: PBKDF2 cost. High enough to be a real KDF, low enough that a test
#: suite driving hundreds of authenticated requests stays fast; the
#: reference's BCryptPasswordEncoder default (cost 10) is the same
#: order of work.
_ITERATIONS = 20_000


def _pbkdf2(password: str, salt: bytes, iterations: int) -> bytes:
    return hashlib.pbkdf2_hmac(
        "sha256", password.encode("utf-8"), salt, iterations
    )


@dataclass
class UserRecord:
    username: str
    salt: bytes
    pw_hash: bytes
    iterations: int
    roles: list[str] = field(default_factory=list)


#: computed once per process (salt + password are module constants):
#: rebuilding the 20k-iteration hash on every admin lookup of an
#: unconfigured install would double each authentication's KDF cost
_DEFAULT_ADMIN_HASH: bytes | None = None
_DEFAULT_ADMIN_SALT = b"cassandra-pv-archiver-default"  # fixed: the
# DEFAULT hash is public knowledge anyway (it guards a fresh install)


def _default_admin_record() -> UserRecord:
    """A fresh default-credentials admin row (new instance every call —
    the reference returns a new mutable object each time, :566)."""
    global _DEFAULT_ADMIN_HASH
    if _DEFAULT_ADMIN_HASH is None:
        _DEFAULT_ADMIN_HASH = _pbkdf2(
            _DEFAULT_ADMIN_PASSWORD, _DEFAULT_ADMIN_SALT, _ITERATIONS
        )
    return UserRecord(
        username=ADMIN_USER_NAME,
        salt=_DEFAULT_ADMIN_SALT,
        pw_hash=_DEFAULT_ADMIN_HASH,
        iterations=_ITERATIONS,
        roles=[ROLE_ADMIN],
    )


class UserRegistry:
    """CRUD + authentication over the user table.

    ``path=None`` keeps the registry in-memory (an unconfigured install:
    only the default ``admin``/``admin`` user exists — the reference
    behaves identically before any user row is written)."""

    def __init__(self, path: str | None = None):
        self.path = path.rstrip("/") if path else None
        self._users: dict[str, UserRecord] = {}
        #: same serialization contract as ChannelRegistry: the HTTP
        #: surface is threaded, and racing atomic_swap_dir calls on one
        #: path can destroy each other's backup mid-swap
        self._lock = threading.RLock()
        if self.path:
            recover_atomic_dir(self.path)
            if os.path.isdir(self.path):
                import pyarrow.parquet as pq

                for r in pq.read_table(self.path).to_pylist():
                    self._users[r["username"]] = UserRecord(
                        username=r["username"],
                        salt=bytes(r["salt"]),
                        pw_hash=bytes(r["pw_hash"]),
                        iterations=int(r["iterations"]),
                        roles=list(r["roles"] or []),
                    )

    def _flush(self) -> None:
        if not self.path:
            return
        import pyarrow as pa

        rows = [
            {
                "username": u.username,
                "salt": u.salt,
                "pw_hash": u.pw_hash,
                "iterations": u.iterations,
                "roles": list(u.roles),
            }
            for u in self._users.values()
        ]
        schema = pa.schema(
            [
                ("username", pa.string()),
                ("salt", pa.binary()),
                ("pw_hash", pa.binary()),
                ("iterations", pa.int32()),
                ("roles", pa.list_(pa.string())),
            ]
        )
        atomic_swap_dir(self.path, pa.Table.from_pylist(rows, schema=schema))

    # -- CRUD (ArchiveUserDetailsManager create/update/delete) -----------
    def create_user(
        self, username: str, password: str, roles: list[str]
    ) -> None:
        if not username:
            raise ValueError("The username must not be empty.")
        if username == ADMIN_USER_NAME:
            # the admin user always exists; "creating" it would shadow
            # the special-case fallback (`:328` refuses the same way for
            # delete; create collides with the implicit row)
            raise ValueError("A user with the specified name already exists.")
        if not password:
            raise ValueError("The password must not be empty.")
        with self._lock:
            if username in self._users:
                raise ValueError(
                    "A user with the specified name already exists."
                )
            salt = secrets.token_bytes(16)
            self._users[username] = UserRecord(
                username=username,
                salt=salt,
                pw_hash=_pbkdf2(password, salt, _ITERATIONS),
                iterations=_ITERATIONS,
                roles=sorted(set(roles)),
            )
            self._flush()

    def delete_user(self, username: str) -> None:
        if username == ADMIN_USER_NAME:
            # `ArchiveUserDetailsManager.java:328`
            raise ValueError("The admin user may not be removed.")
        with self._lock:
            self._users.pop(username, None)  # reference delete idempotent
            self._flush()

    def change_password(self, username: str, old: str, new: str) -> None:
        """`changePassword:188-252`: verifies the OLD password before
        storing the new hash; works for the implicit admin row too (the
        first password change materializes it)."""
        if not new:
            raise ValueError("The new password must not be empty.")
        with self._lock:
            return self._change_password_locked(username, old, new)

    def _change_password_locked(self, username: str, old: str, new: str):
        rec = self._lookup(username)
        if rec is None:
            raise KeyError(username)
        if not hmac.compare_digest(
            rec.pw_hash, _pbkdf2(old, rec.salt, rec.iterations)
        ):
            raise ValueError(
                "The specified old password does not match the stored"
                " password."
            )
        salt = secrets.token_bytes(16)
        self._users[username] = UserRecord(
            username=username,
            salt=salt,
            pw_hash=_pbkdf2(new, salt, _ITERATIONS),
            iterations=_ITERATIONS,
            roles=list(rec.roles),
        )
        self._flush()

    # -- authentication ---------------------------------------------------
    def _lookup(self, username: str) -> UserRecord | None:
        rec = self._users.get(username)
        if rec is None and username == ADMIN_USER_NAME:
            return _default_admin_record()
        return rec

    def authenticate(self, username: str, password: str) -> frozenset[str] | None:
        """Roles for (username, password), or None when the credentials
        don't resolve. Constant-time hash compare; unknown user and wrong
        password are indistinguishable to the caller."""
        rec = self._lookup(username)
        if rec is None:
            # burn the same KDF cost as a real verification: an instant
            # rejection for unknown usernames is a timing oracle that
            # enumerates valid accounts
            _pbkdf2(password, b"timing-equalizer", _ITERATIONS)
            return None
        if not hmac.compare_digest(
            rec.pw_hash, _pbkdf2(password, rec.salt, rec.iterations)
        ):
            return None
        return frozenset(rec.roles)
