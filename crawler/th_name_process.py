"""Keyword/tag preprocessor: pick the best Pixiv tag per character.

Capability parity with ``/root/reference/crawler/th_name_process.py``: for
each character row (CH,JP,EN name variants), generate candidate tags by
splitting on separators (full-width space, ``・``, space, ``·``), scrape each
candidate's Pixiv tag page artwork count from the meta description, and keep
the variant with the maximum count whose description mentions the franchise
tag (``东方Project``), writing ``name,keyword,cnt`` rows
(-> ``th_name_processed.csv``, the input of ``pixiv_crawl.py``).

Pure logic (``process_name``, ``find_count``, ``find_related_tag``) is
importable and tested; the scraping path lazily uses
undetected-chromedriver + BeautifulSoup like the reference.
"""
from __future__ import annotations

import random
import re
import time
from typing import Iterator


def process_name(name: str) -> Iterator[str]:
    """Yield tag candidates for one raw name (reference :70-83, with its
    bug fixed: the recursive '/' branch dropped its children — here they are
    yielded)."""
    if "/" in name:
        for part in name.split("/"):
            yield from process_name(part.strip())
        return
    name = name.strip()
    if not name:
        return
    yield name
    for sp in ("　", "・", " ", "·"):
        if sp in name:
            yield name.replace(sp, "")
            for piece in name.split(sp):
                piece = piece.strip()
                if piece:
                    yield piece


def find_count(description: str) -> int:
    """Artwork count from a tag-page meta description: the ``NNN件`` pattern
    with thousand separators (reference :55-63)."""
    m = re.search(r"((\d+[,]?)*\d+)件", description or "")
    return int(m.group(1).replace(",", "")) if m else -1


def find_related_tag(description: str, related_tag: str) -> bool:
    return related_tag in (description or "")


# ---------------------------------------------------------------------------
# scraping (requires a browser driver)
# ---------------------------------------------------------------------------

def _make_driver():
    import undetected_chromedriver as uc

    return uc.Chrome(options=uc.ChromeOptions())


def get_illust_description_by_tag(driver, tag: str) -> str:
    from bs4 import BeautifulSoup

    driver.get(f"https://www.pixiv.net/tags/{tag}/artworks")
    for _ in range(10):
        driver.execute_script("window.scrollBy(0, 500)")
        time.sleep(random.uniform(0.5, 2))
    soup = BeautifulSoup(driver.page_source, "html.parser")
    meta = soup.find("meta", {"name": "description"})
    return meta.get("content", "") if meta else ""


def filter_tags_by_count_and_related_tags_saving_to(
    rows: list[dict], related_tag: str, save_csv: str, driver=None
) -> list[dict]:
    """For each row (dict of name variants), choose the candidate tag with
    max artwork count mentioning ``related_tag``; stream results to CSV."""
    driver = driver or _make_driver()
    out = []
    with open(save_csv, "w", newline="", encoding="utf-8") as f:
        print("name,keyword,cnt", file=f)
        for row in rows:
            zh_name = row["CH"]
            target_tag, max_cnt = zh_name, 0
            for raw_name in row.values():
                for cand in process_name(str(raw_name)):
                    des = get_illust_description_by_tag(driver, cand)
                    cnt = find_count(des)
                    print(f"Checking {cand}... count: {cnt}")
                    if find_related_tag(des, related_tag) and cnt > max_cnt:
                        max_cnt, target_tag = cnt, cand
            out.append({"name": zh_name, "keyword": target_tag, "cnt": max_cnt})
            print(f"{zh_name},{target_tag},{max_cnt}", file=f)
            f.flush()
    return out


def preprocess(franchise_tag: str = "东方Project",
               raw_tag_csv: str = "th_name_raw.csv",
               target_tag_csv: str = "th_name_processed.csv"):
    import csv

    with open(raw_tag_csv, encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    filter_tags_by_count_and_related_tags_saving_to(rows, franchise_tag, target_tag_csv)


if __name__ == "__main__":
    preprocess()
