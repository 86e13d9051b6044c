"""Publication scraping (SURVEY §2.1 S4-S8) — driver-side I/O.

Same observable API as the reference (src/utils/scrape_util.py:18-123):
pages → file-link catalogs → binary downloads → local save. Implemented
with the stdlib only (urllib + html.parser, no requests/bs4 in this
environment); ``fetch`` is injectable so tests run on local HTML and
production can swap in any HTTP client.

Terminology (reference's): a *publication* has *pages*; a page has
*file links*; a link resolves to a *file*.
"""

from __future__ import annotations

import os
import urllib.request
from collections.abc import Callable
from html.parser import HTMLParser

Fetch = Callable[[str], str]


def _default_fetch(url: str) -> str:
    with urllib.request.urlopen(url) as res:  # noqa: S310 — driver-side HTTP
        if res.status != 200:
            raise RuntimeError(f"HTTP {res.status} for {url}")
        return res.read().decode("utf-8", errors="replace")


class _AnchorCollector(HTMLParser):
    """Collect <a> tags (href, class) grouped under ancestor ids.

    A minimal stand-in for the reference's BeautifulSoup usage: it only
    needs 'first/all anchors under the element with id X'.
    """

    def __init__(self) -> None:
        super().__init__()
        self._id_stack: list[tuple[str, int]] = []  # (id value, depth)
        self._depth = 0
        self.anchors: list[tuple[tuple[str, ...], str, str]] = []
        # (active ancestor ids, href, class attr)

    def handle_starttag(self, tag, attrs):
        self._depth += 1
        attrs = dict(attrs)
        if "id" in attrs:
            self._id_stack.append((attrs["id"], self._depth))
        if tag == "a":
            ids = tuple(i for i, _ in self._id_stack)
            self.anchors.append(
                (ids, attrs.get("href", ""), attrs.get("class", ""))
            )

    def handle_endtag(self, tag):
        while self._id_stack and self._id_stack[-1][1] >= self._depth:
            self._id_stack.pop()
        self._depth -= 1


def _anchors_under(html: str, element_id: str) -> list[tuple[str, str]]:
    p = _AnchorCollector()
    p.feed(html)
    return [
        (href, cls) for ids, href, cls in p.anchors if element_id in ids
    ]


def get_nhsd_pages(
    publication: str,
    n: int | bool = False,
    url: str = "https://digital.nhs.uk",
    section: str = "/data-and-information/publications/statistical/",
    fetch: Fetch = _default_fetch,
) -> list[str]:
    """Latest + past page hrefs for a publication (S4).

    Reference: src/utils/scrape_util.py:18-53 — latest page from the
    ``latest-statistics`` div's first anchor; past pages from the
    ``past-publications`` div's ``cta__button`` anchors; ``n`` trims to
    the n most recent (n=1 → latest only).
    """
    html = fetch(url + section + publication + "/")
    pages: list[str] = []

    latest = _anchors_under(html, "latest-statistics")
    if latest:
        pages.append(latest[0][0])
    if n == 1:
        return pages

    past = [
        href
        for href, cls in _anchors_under(html, "past-publications")
        if "cta__button" in cls.split()
    ]
    if n:
        past = past[: n - 1]
    pages.extend(past)
    return pages


def get_file_links_from_page(
    page: str,
    url: str = "https://digital.nhs.uk",
    fetch: Fetch = _default_fetch,
) -> dict[str, dict[str, str]]:
    """Parse a page's ``resources`` div into {file_id: {url, period, ext}}.

    Reference: src/utils/scrape_util.py:56-93 — URL-decode %20/%2C in the
    filename; ids with a trailing ", <period>" get a period key, others
    only url+ext.
    """
    html = fetch(url + page)
    relevant: dict[str, dict[str, str]] = {}
    for href, _cls in _anchors_under(html, "resources"):
        if not href:
            continue
        filename = href.split("/")[-1]
        clean = filename.replace("%20", " ").replace("%2C", ",")
        try:
            file_id, period_ext = clean.rsplit(",", 1)
            period, ext = period_ext.split(".")[0], period_ext.split(".")[1]
            relevant[file_id] = {"url": href, "period": period, "ext": ext}
        except (ValueError, IndexError):
            parts = clean.split(".")
            relevant[parts[0]] = {"url": href, "ext": parts[1] if len(parts) > 1 else ""}
    return relevant


def download_file_from_id(
    file_links: dict[str, dict[str, str]],
    file_id: str,
    fetch_bytes: Callable[[str], bytes] | None = None,
) -> bytes | int:
    """HTTP GET a file's content by id; 0 on failure (S6 — the
    reference's sentinel, kept for API parity)."""
    try:
        target_url = file_links[file_id]["url"]
    except KeyError:
        print(f"'{file_id}' could not be found for this publication.")
        return 0
    try:
        if fetch_bytes is not None:
            return fetch_bytes(target_url)
        with urllib.request.urlopen(target_url) as res:  # noqa: S310
            if res.status != 200:
                raise RuntimeError(f"status {res.status}")
            return res.read()
    except Exception as exc:  # mirror the reference's warn-and-0 contract
        print(f"Failed to download file with the following url:\n{target_url}.\n{exc}")
        return 0


def save_file(content: bytes, file_name: str, dest_dir: str = "./data") -> str:
    """Write downloaded bytes to dest_dir/file_name (S7)."""
    target = os.path.join(dest_dir, file_name)
    with open(target, "wb") as fh:
        fh.write(content)
    return target


def select_exactly_one(
    links: dict[str, dict[str, str]], target_ids: list[str]
) -> list[str]:
    """Keep a file iff exactly one catalog id contains the target
    substring; warn on 0 or >1 (S8 — reference: src/main.py:49-63)."""
    selected: list[str] = []
    for target in target_ids:
        found = [fid for fid in links if target in fid]
        if len(found) == 1:
            selected.append(found[0])
        elif not found:
            print(f"Warning: No files were found for the {target} target.")
        else:
            print(
                f"Warning: Multiple files were found for the {target} "
                "target. These files won't be processed."
            )
    return selected
