"""Offline tests for the scraping surface (S4-S8) using injected HTML."""

from __future__ import annotations

from cancer_survival_etl_spark.sources.scrape import (
    download_file_from_id,
    get_file_links_from_page,
    get_nhsd_pages,
    save_file,
    select_exactly_one,
)

PUBLICATION_HTML = """
<html><body>
<div id="latest-statistics">
  <p>Latest</p>
  <a href="/pub/cancer-survival-in-england/2023">2023</a>
</div>
<div id="past-publications">
  <a class="other" href="/ignore-me">nav</a>
  <a class="cta__button" href="/pub/2022">2022</a>
  <a class="cta__button" href="/pub/2021">2021</a>
  <a class="cta__button" href="/pub/2020">2020</a>
</div>
<div id="footer"><a href="/elsewhere">x</a></div>
</body></html>
"""

PAGE_HTML = """
<html><body>
<div id="resources">
  <a href="/files/Index%20of%20cancer%20survival%2C%202016-2020.xlsx">idx</a>
  <a href="/files/adult_2016_2020.xlsx">adult</a>
  <a href="">empty-link-comment</a>
</div>
<div id="other"><a href="/files/decoy.xlsx">decoy</a></div>
</body></html>
"""


def fetch(url: str) -> str:
    if url.endswith("/pub-name/"):
        return PUBLICATION_HTML
    return PAGE_HTML


def test_get_nhsd_pages_latest_and_past():
    pages = get_nhsd_pages(
        "pub-name", url="https://x", section="/", fetch=fetch
    )
    assert pages == [
        "/pub/cancer-survival-in-england/2023",
        "/pub/2022",
        "/pub/2021",
        "/pub/2020",
    ]
    assert get_nhsd_pages("pub-name", n=1, url="https://x", section="/", fetch=fetch) == [
        "/pub/cancer-survival-in-england/2023"
    ]
    assert get_nhsd_pages("pub-name", n=2, url="https://x", section="/", fetch=fetch) == [
        "/pub/cancer-survival-in-england/2023",
        "/pub/2022",
    ]


def test_get_file_links_decoding_and_period():
    links = get_file_links_from_page("/page", url="https://x", fetch=fetch)
    # %20 → space, %2C → comma; trailing ", period.ext" split out
    assert links["Index of cancer survival"] == {
        "url": "/files/Index%20of%20cancer%20survival%2C%202016-2020.xlsx",
        "period": " 2016-2020",
        "ext": "xlsx",
    }
    # no-period variant: id is the stem, no period key
    assert links["adult_2016_2020"] == {
        "url": "/files/adult_2016_2020.xlsx",
        "ext": "xlsx",
    }
    # anchors outside the resources div are ignored; empty hrefs skipped
    assert not any("decoy" in k for k in links)


def test_select_exactly_one(capsys):
    links = get_file_links_from_page("/page", url="https://x", fetch=fetch)
    assert select_exactly_one(links, ["adult"]) == ["adult_2016_2020"]
    assert select_exactly_one(links, ["nope"]) == []
    assert "No files were found" in capsys.readouterr().out
    # ambiguous target: both ids contain "d" ("Index…", "adult…")
    assert select_exactly_one(links, ["d"]) == []
    assert "Multiple files were found" in capsys.readouterr().out


def test_download_and_save(tmp_path):
    links = {"f": {"url": "https://x/files/f.xlsx", "ext": "xlsx"}}
    out = download_file_from_id(links, "f", fetch_bytes=lambda u: b"bytes!")
    assert out == b"bytes!"
    assert download_file_from_id(links, "missing") == 0
    dest = save_file(out, "f.xlsx", dest_dir=str(tmp_path))
    assert open(dest, "rb").read() == b"bytes!"
