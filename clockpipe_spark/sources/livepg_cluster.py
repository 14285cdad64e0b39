"""Throwaway local PostgreSQL cluster manager — the dev/test/bench
utility behind tests/test_live_postgres.py and bench.py's live block.

The sandbox ships PostgreSQL server binaries but no JDBC jar, so live
verification runs against a private cluster: ``initdb`` into a temp
dir, ``wal_level=logical``, unix-socket only (no TCP listener), torn
down afterwards.  ``psql`` backs the SQL transport (the adapter's
reader/sql_runner seams accept it directly); rows round-trip through a
``row_to_json`` wrap so types survive where CSV would flatten them.

Nothing here runs in a deployment — a real cluster + the JDBC jar
replace it — but every SQL statement the engine issues through these
helpers is the same one it issues through JDBC.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import tempfile

_PORT = 54411  # names the socket file only; there is no TCP listener
_CMD_TIMEOUT = 60  # seconds; a wedged server must never wedge a bench


def find_pgbin() -> str | None:
    """Newest locally-installed PostgreSQL server bin dir, or None.

    Sorted NUMERICALLY on the version path segment — a lexicographic
    sort would prefer 9.6 over 10..17 on hosts with accreted installs
    (and logical-slot advance needs PG >= 11)."""

    def version_key(path: str):
        seg = os.path.basename(os.path.dirname(path))
        try:
            return tuple(int(x) for x in seg.split("."))
        except ValueError:
            return (-1,)

    for c in sorted(
        glob.glob("/usr/lib/postgresql/*/bin"), key=version_key, reverse=True
    ):
        if os.path.exists(os.path.join(c, "initdb")):
            return c
    return None


def available() -> bool:
    return find_pgbin() is not None and shutil.which("psql") is not None


def _run(cmd: list[str], timeout: int = _CMD_TIMEOUT, **kw):
    return subprocess.run(
        cmd, capture_output=True, text=True, cwd="/tmp", timeout=timeout, **kw
    )


class LivePgCluster:
    """One throwaway cluster: ``start()`` (or skip/raise), use the SQL
    helpers, ``stop()``.  Also usable as a context manager."""

    def __init__(self):
        self.root: str | None = None
        self._pgbin: str | None = None
        self._started = False
        self.psql: list[str] = []

    # -- lifecycle ----------------------------------------------------------
    def _as_pg(self, cmd: str):
        # initdb/postgres refuse to run as root; drop to the postgres
        # user when needed, run directly otherwise
        if os.geteuid() == 0:
            return _run(["su", "postgres", "-c", cmd])
        return _run(["bash", "-c", cmd])

    def start(self) -> "LivePgCluster":
        """Boot the cluster; raises RuntimeError with the failing step's
        stderr tail when the environment cannot host one."""
        pgbin = find_pgbin()
        if pgbin is None or shutil.which("psql") is None:
            raise RuntimeError("no PostgreSQL server binaries")
        self._pgbin = pgbin
        self.root = tempfile.mkdtemp(prefix="clockpipe_livepg_")
        # hand the dir to the postgres user, NOT world-writable: 0777 +
        # trust auth would give every local user password-less
        # superuser through the socket. root traverses 0700 regardless;
        # the non-root path keeps the mkdtemp owner.
        if os.geteuid() == 0:
            try:
                shutil.chown(self.root, user="postgres", group="postgres")
            except (LookupError, PermissionError, OSError) as ex:
                self.stop()
                raise RuntimeError(f"no postgres user to own the cluster: {ex}")
        os.chmod(self.root, 0o700)
        data = os.path.join(self.root, "data")
        r = self._as_pg(f"{pgbin}/initdb -D {data} -A trust --no-sync")
        if r.returncode != 0:
            self.stop()
            raise RuntimeError(f"initdb failed: {r.stderr[-200:]}")
        with open(os.path.join(data, "postgresql.conf"), "a") as f:
            f.write(
                "\nwal_level = logical\nmax_replication_slots = 32\n"
                "max_wal_senders = 32\nlisten_addresses = ''\n"
                f"unix_socket_directories = '{self.root}'\nfsync = off\n"
            )
        r = self._as_pg(
            f"{pgbin}/pg_ctl -D {data} -l {self.root}/server.log "
            f"-o '-p {_PORT}' -w start"
        )
        if r.returncode != 0:
            self.stop()
            raise RuntimeError(f"postgres failed to start: {r.stderr[-200:]}")
        self._started = True
        self.psql = [
            "psql", "-h", self.root, "-p", str(_PORT), "-U", "postgres",
            "-d", "postgres", "-v", "ON_ERROR_STOP=1",
        ]
        return self

    def stop(self) -> None:
        if self._started and self.root and self._pgbin:
            self._as_pg(
                f"{self._pgbin}/pg_ctl -D {self.root}/data -m immediate stop"
            )
            self._started = False
        if self.root:
            shutil.rmtree(self.root, ignore_errors=True)
            self.root = None

    def __enter__(self) -> "LivePgCluster":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- SQL helpers --------------------------------------------------------
    def sql(self, statement: str) -> None:
        r = _run(self.psql + ["-q", "-c", statement])
        if r.returncode != 0:
            raise RuntimeError(f"psql failed: {r.stderr}\nSQL: {statement}")

    def rows(self, query: str) -> list[dict]:
        """Typed rows via row_to_json — booleans/ints survive, unlike CSV."""
        r = _run(self.psql + ["-t", "-A", "-c",
                              f"SELECT row_to_json(q)::text FROM ({query}) q"])
        if r.returncode != 0:
            raise RuntimeError(f"psql failed: {r.stderr}\nSQL: {query}")
        return [json.loads(line) for line in r.stdout.splitlines() if line]

    def copy_bytes(self, table: str) -> bytes:
        r = subprocess.run(
            self.psql + ["-c", f"COPY {table} TO STDOUT"],
            capture_output=True, cwd="/tmp", timeout=_CMD_TIMEOUT,
        )
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode())
        return r.stdout

    def peek_frames(
        self, slot: str, pub: str, nchanges: int | None = None
    ) -> list[tuple[int, int, bytes]]:
        """The reference's peek call, verbatim semantics: peek (not
        get), binary changes, pgoutput proto 1, optional change cap
        (the peek_changes_limit role, config.rs:146-149).  Issues the
        SAME options tail the adapter's peek_changes does (shared
        constant) and decodes LSNs with the shared codec, so the
        Spark-free tests exercise the identical server call — the two
        cannot drift apart."""
        from clockpipe_spark.sources.jdbc_adapter import (
            PGOUTPUT_PEEK_OPTIONS,
            lsn_from_text,
        )

        cap = "NULL" if nchanges is None else str(nchanges)
        out = self.rows(
            "SELECT lsn::text AS lsn, xid::text AS xid, encode(data,'hex') AS hx "
            f"FROM pg_logical_slot_peek_binary_changes('{slot}', NULL, {cap}, "
            f"{PGOUTPUT_PEEK_OPTIONS}, '{pub}')"
        )
        return [
            (lsn_from_text(r["lsn"]), int(r["xid"]), bytes.fromhex(r["hx"]))
            for r in out
        ]

    def oid(self, table: str) -> int:
        return int(self.rows(f"SELECT '{table}'::regclass::oid AS o")[0]["o"])

    def advance(self, slot: str, lsn: int) -> None:
        """Consume through ``lsn`` — the reference's advance-after-write
        step (T2: peek, process, then move the cursor)."""
        from clockpipe_spark.sources.jdbc_adapter import lsn_to_text

        self.rows(
            "SELECT pg_replication_slot_advance("
            f"'{slot}', '{lsn_to_text(lsn)}')::text AS r"
        )

    # -- adapter seams ------------------------------------------------------
    def _peek_fast(self, spark, query: str):
        """Batched peek transport (VERDICT r9 directive #6): stream the
        peek result as one psql TSV write to a spool file and let
        Spark's JVM CSV reader parse it — zero Python per-row work.

        The generic ``rows()`` seam pays ~1.3 s per 65k-frame peek in
        pure Python (json.loads per line + list-of-dicts -> pandas ->
        arrow), profiled at ~40% of the whole drain's transport cost.
        The peek's 3 columns are textually closed (pg_lsn 'X/Y', xid
        digits, hex — none can contain a tab/newline/quote), so TSV is
        unambiguous.  Spool files live under the cluster root (removed
        at ``stop()``) because the returned frame is LAZY — the
        adapter's eager localCheckpoint materializes it exactly once,
        but deleting the file here would race that checkpoint."""
        spool = tempfile.mkdtemp(prefix="peek_", dir=self.root)
        path = os.path.join(spool, "frames.tsv")
        with open(path, "w") as out:
            r = subprocess.run(
                self.psql + ["-q", "-t", "-A", "-F", "\t", "-c", query],
                stdout=out, stderr=subprocess.PIPE, text=True,
                cwd="/tmp", timeout=_CMD_TIMEOUT,
            )
        if r.returncode != 0:
            raise RuntimeError(f"psql failed: {r.stderr}\nSQL: {query}")
        return spark.read.csv(
            path, sep="\t",
            schema="lsn_txt string, xid_txt string, data_hex string",
        )

    def seam_reader(self, spark):
        """psql-backed stand-in for the JDBC reader seam (deployment
        uses the real relation; only the transport differs).  Peek
        queries take the spooled-TSV fast path; everything else (small
        introspection/bounds results) keeps the typed row_to_json
        path."""
        import re as _re

        def reader(options: dict):
            q = options.get("query") or f"SELECT * FROM {options['dbtable']}"
            if "pg_logical_slot_peek_binary_changes" in q and "data_hex" in q:
                return self._peek_fast(spark, q)
            rows = self.rows(q)
            if not rows:
                # a real JDBC relation carries the result schema even
                # for zero rows; psql's json rendering loses it, so the
                # seam reconstructs it from the statement's aliases
                cols = _re.findall(r"AS (\w+)", q.split("FROM")[0]) or ["empty"]
                return spark.createDataFrame(
                    [], ", ".join(f"{c} string" for c in cols)
                )
            import pandas as pd

            return spark.createDataFrame(pd.DataFrame(rows))

        return reader

    def adapter(self, spark):
        """A JdbcPostgresSource wired to this cluster through the seams."""
        from clockpipe_spark.sources.jdbc_adapter import JdbcPostgresSource

        return JdbcPostgresSource(
            spark, "jdbc:postgresql://unused/postgres",
            reader=self.seam_reader(spark), sql_runner=self.sql,
        )
