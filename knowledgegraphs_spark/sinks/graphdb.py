"""S14: GraphDB (RDF4J-protocol) upload sink.

The reference creates/rewrites a repository through the RDF4J repository
manager and uploads the final Turtle file over one connection
(``E_CreateKG/GraphDB.java:38-120``). Those manager/connection calls are
REST underneath, so this sink speaks the protocol directly with stdlib
``urllib`` — no client jar, no Python dependency:

* repository create  → ``PUT  {endpoint}/repositories/{repo}``  (config turtle)
* replace statements → ``PUT  {endpoint}/repositories/{repo}/statements``
* append statements  → ``POST {endpoint}/repositories/{repo}/statements``
  with ``Content-Type: text/turtle``.

Spark-first shape: the driver optionally creates/clears the repository,
then every partition POSTs its own Turtle chunk from the executor
(``foreachPartition``) — N parallel appends instead of the reference's
single-connection upload; each POST retries with backoff like the Kafka
sink (``sinks/kafka.py``). POST/append is idempotent only at the triple
level (RDF graphs are sets), which is exactly why append (not replace)
is the per-partition verb.

Atomicity: the reference uploads DO + full graph in ONE transaction
(``E_CreateKG/GraphDB.java:150-163``) — a mid-upload failure leaves the
repository untouched. The parallel-append default trades that for
throughput: a failed partition leaves a PARTIAL repository (documented
divergence; re-running the idempotent append completes it).
``upload_triples(..., atomic=True)`` restores reference parity through
the RDF4J transactions protocol (``POST /transactions`` → per-chunk
``PUT ?action=ADD`` → ``PUT ?action=COMMIT``, ``DELETE`` = rollback on
any failure): all-or-nothing, at the cost of streaming the chunks
through the driver sequentially — the right mode for dimension-sized
graphs, not the 100-TB fact path."""

from __future__ import annotations

import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame

_REPO_CONFIG_TTL = """
@prefix rep: <http://www.openrdf.org/config/repository#> .
@prefix sr: <http://www.openrdf.org/config/repository/sail#> .
@prefix sail: <http://www.openrdf.org/config/sail#> .
[] a rep:Repository ;
   rep:repositoryID "{repo_id}" ;
   rep:repositoryImpl [
      rep:repositoryType "graphdb:SailRepository" ;
      sr:sailImpl [ sail:sailType "graphdb:Sail" ]
   ] .
""".lstrip()


def _request(
    url: str,
    method: str,
    body: bytes,
    content_type: str,
    retries: int,
    timeout: float,
    want_location: bool = False,
) -> int | str:
    last: Exception | None = None
    for attempt in range(retries):
        req = urllib.request.Request(
            url, data=body, method=method, headers={"Content-Type": content_type}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                if want_location:
                    return resp.headers.get("Location", "")
                return resp.status
        except urllib.error.HTTPError as e:  # 4xx/5xx: retry only server errors
            last = e
            if e.code < 500:
                raise
        except urllib.error.URLError as e:
            last = e
        time.sleep(min(2.0**attempt * 0.2, 2.0))
    raise RuntimeError(f"GraphDB upload failed after {retries} attempts: {last}")


def create_repository(
    endpoint: str, repo_id: str, rewrite: bool = False, retries: int = 3, timeout: float = 30.0
) -> None:
    """Driver-side repository (re)creation, mirroring
    ``GraphDB.createRepository`` (delete-then-create when ``rewrite``)."""
    if rewrite:
        try:
            _request(
                f"{endpoint}/repositories/{repo_id}", "DELETE", b"", "text/plain", 1, timeout
            )
        except Exception:
            pass  # absent repo: nothing to delete
    config = _REPO_CONFIG_TTL.format(repo_id=repo_id).encode("utf-8")
    _request(f"{endpoint}/repositories/{repo_id}", "PUT", config, "text/turtle", retries, timeout)


def upload_triples(
    triples: DataFrame,
    endpoint: str,
    repo_id: str,
    retries: int = 3,
    timeout: float = 60.0,
    batch_rows: int = 10_000,
    atomic: bool = False,
) -> None:
    """S14 at scale: serialize each partition to Turtle (the existing S12
    serializer expressions) and POST it from the executor — parallel
    appends, per-request retry, no driver bottleneck or collect.

    ``atomic=True`` = reference-parity single-transaction upload
    (``GraphDB.java:150-163``): one RDF4J transaction, Turtle chunks
    streamed through the driver (``toLocalIterator`` — one partition in
    memory at a time) as sequential ``?action=ADD`` requests, then a
    single COMMIT; ANY failure rolls the transaction back, leaving the
    repository exactly as it was."""
    from .turtle import prefix_header, ttl_lines

    lines = ttl_lines(triples)
    url = f"{endpoint}/repositories/{repo_id}/statements"
    header = prefix_header()

    if atomic:
        _upload_in_transaction(lines, endpoint, repo_id, header, retries, timeout, batch_rows)
        return

    def send(it):
        def post(buf: list[str]) -> None:
            body = (header + "\n".join(buf)).encode("utf-8")
            _request(url, "POST", body, "text/turtle", retries, timeout)

        buf: list[str] = []
        for row in it:
            buf.append(row["value"])
            if len(buf) >= batch_rows:
                post(buf)
                buf.clear()
        if buf:
            post(buf)

    lines.foreachPartition(send)


def _upload_in_transaction(
    lines: DataFrame,
    endpoint: str,
    repo_id: str,
    header: str,
    retries: int,
    timeout: float,
    batch_rows: int,
) -> None:
    """RDF4J transactions protocol: POST /transactions opens (Location =
    the transaction URL), PUT ?action=ADD stages each chunk, PUT
    ?action=COMMIT publishes all of it at once; on any failure the
    transaction is DELETEd (rollback) and the error re-raised — the
    repository is never observed partially uploaded."""
    txn_url = _request(
        f"{endpoint}/repositories/{repo_id}/transactions",
        "POST", b"", "text/plain", retries, timeout, want_location=True,
    )
    if not txn_url:
        raise RuntimeError("GraphDB did not return a transaction Location")
    try:
        buf: list[str] = []

        def add(chunk: list[str]) -> None:
            body = (header + "\n".join(chunk)).encode("utf-8")
            _request(f"{txn_url}?action=ADD", "PUT", body, "text/turtle", retries, timeout)

        for row in lines.toLocalIterator():
            buf.append(row["value"])
            if len(buf) >= batch_rows:
                add(buf)
                buf.clear()
        if buf:
            add(buf)
        _request(f"{txn_url}?action=COMMIT", "PUT", b"", "text/plain", retries, timeout)
    except BaseException:
        try:
            _request(txn_url, "DELETE", b"", "text/plain", 1, timeout)
        except Exception:
            pass  # server GC will expire the abandoned transaction
        raise
