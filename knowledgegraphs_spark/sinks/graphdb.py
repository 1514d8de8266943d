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
is the per-partition verb."""

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


def _request(url: str, method: str, body: bytes, content_type: str, retries: int, timeout: float) -> int:
    last: Exception | None = None
    for attempt in range(retries):
        req = urllib.request.Request(
            url, data=body, method=method, headers={"Content-Type": content_type}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
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
) -> None:
    """S14 at scale: serialize each partition to Turtle (the existing S12
    serializer expressions) and POST it from the executor — parallel
    appends, per-request retry, no driver bottleneck or collect."""
    from .turtle import prefix_header, ttl_lines

    lines = ttl_lines(triples)
    url = f"{endpoint}/repositories/{repo_id}/statements"
    header = prefix_header()

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
