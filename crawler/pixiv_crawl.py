"""Pixiv dataset crawler.

Capability parity with ``/root/reference/crawler/pixiv_crawl.py`` (the L0
stage that builds ``data/unfiltered/<label>/N.jpg``):

- CLI: ``--target`` keyword CSV, ``--limit`` images/keyword, ``--freq``
  request pacing, ``--path`` output root, ``--username``/``--password``
  cookie-login flow, ``--popularity`` keyword cutoff (default 2000),
  ``--always-restart`` crash-restart loop (reference :496-523),
- keyword CSV filter: only keywords with ``cnt >= popularity``
  (reference :392-394),
- per-page thumbnail extraction restricted to ``i.pximg.net`` ``img-master``
  URLs (reference :173-175),
- human-mimicking interaction (scroll/pauses) and a gaussian sleep scheduler
  with periodic long pauses (reference :85-106),
- seen-URL persistence + skip-existing resume (reference :220-226, 320-336),
- per-download retries with randomized sleep, redirect retries,
- ``guarder``: infinite retry-after-10-minutes wrapper under
  ``--always-restart`` (reference :511-521).

Browser automation needs ``selenium``/``undetected-chromedriver`` (not baked
into this image) — the import is lazy and the pure logic (URL criteria,
scheduler, seen-set, CSV filter) is importable and unit-tested without it.

Scraping etiquette: this targets only keyword search result thumbnails, with
deliberately slow pacing, for building a research dataset — mirroring the
reference pipeline's documented use.
"""
from __future__ import annotations

import argparse
import csv
import os
import random
import re
import time


# ---------------------------------------------------------------------------
# pure logic (unit-testable without a browser)
# ---------------------------------------------------------------------------

_MASTER_RE = re.compile(r"^https://i\.pximg\.net/.*/img-master/.*_p0_(master|square)")

# stop a keyword after this many CONSECUTIVE pages that yield zero
# successful downloads: Pixiv clamps out-of-range ?p= to the last results
# page, so "page all seen" can repeat forever on a fully-crawled keyword
# (60 thumbnails/page -> tolerates ~3.6k already-crawled images before the
# first fresh one, far beyond the default --limit). Keyed on download
# SUCCESS, not on unseen URLs: a persistently undownloadable URL (deleted
# work, 404 thumbnail) never enters the seen-set and would otherwise keep
# the clamped last page "unseen" forever.
MAX_ALL_SEEN_PAGES = 60

# give up on a URL after this many failed download attempts within one run
# (it stops counting as crawlable, so it can't pin the exhaustion bound)
MAX_URL_FAILURES = 3


def is_master_thumbnail(url: str) -> bool:
    """The reference keeps only first-page master thumbnails from
    ``i.pximg.net/img-master`` (:173-175)."""
    return bool(_MASTER_RE.match(url))


def thumbnail_to_image_id(url: str) -> str | None:
    m = re.search(r"/(\d+)_p\d+_", url)
    return m.group(1) if m else None


def load_keywords(csv_path: str, popularity: int = 2000) -> list[tuple[str, str]]:
    """Rows of ``name,keyword,cnt`` with ``cnt >= popularity``
    (the reference's cutoff, :392-394 / :505)."""
    out = []
    with open(csv_path, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            try:
                cnt = int(float(row.get("cnt", 0) or 0))
            except ValueError:
                cnt = 0
            if cnt >= popularity:
                out.append((row["name"], row["keyword"]))
    return out


def sleep_scheduler(freq: float = 1.0, long_pause_every: int = 25,
                    long_pause: float = 30.0, rng: random.Random | None = None):
    """Generator of sleep durations: gaussian around ``freq`` seconds with a
    ``long_pause``-second breather every ~``long_pause_every`` requests
    (reference :85-106)."""
    rng = rng or random.Random()
    i = 0
    while True:
        i += 1
        if i % long_pause_every == 0:
            yield long_pause + abs(rng.gauss(0, 5))
        else:
            yield max(0.2, rng.gauss(freq, freq / 4))


class SeenUrls:
    """Persistent crawl-resume set (reference :220-226)."""

    def __init__(self, path: str):
        self.path = path
        self.seen: set[str] = set()
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                self.seen = {line.strip() for line in f if line.strip()}

    def __contains__(self, url: str) -> bool:
        return url in self.seen

    def add(self, url: str) -> None:
        if url in self.seen:
            return
        self.seen.add(url)
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(url + "\n")


def existing_count(label_dir: str) -> int:
    if not os.path.isdir(label_dir):
        return 0
    return sum(1 for f in os.listdir(label_dir) if f.lower().endswith(".jpg"))


def next_free_index(label_dir: str) -> int:
    """Smallest N such that ``N.jpg`` names never collide with ANY existing
    file stem. A plain count would clobber kept images once numbering has
    holes — e.g. after a review pass renamed some ``K.jpg`` to
    ``K.invalid``, count=70 would overwrite the kept ``70.jpg``."""
    if not os.path.isdir(label_dir):
        return 0
    used = set()
    for f in os.listdir(label_dir):
        stem = f.split(".", 1)[0]
        if stem.isdigit():
            used.add(int(stem))
    return max(used) + 1 if used else 0


def guarder(fn, always_restart: bool = False, backoff: float = 600.0):
    """Crash-restart loop (reference :511-521)."""
    while True:
        try:
            fn()
            return
        except KeyboardInterrupt:
            raise
        except Exception as e:
            print(f"Crawler crashed: {e!r}")
            if not always_restart:
                raise
            print(f"Restarting in {backoff / 60:.0f} minutes...")
            time.sleep(backoff)


# ---------------------------------------------------------------------------
# browser-driven crawl (lazy selenium import)
# ---------------------------------------------------------------------------

REQUEST_HEADERS = {
    "Referer": "https://www.pixiv.net/",
    "User-Agent": "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36",
}


class _ByFallback:
    """selenium.webdriver.common.by.By's locator strings, so the browser
    functions run against an injected driver object (tests, alternative
    automation backends) without selenium installed."""
    TAG_NAME = "tag name"
    CSS_SELECTOR = "css selector"


def _by():
    try:
        from selenium.webdriver.common.by import By
        return By
    except ImportError:
        return _ByFallback


def _make_driver():
    try:
        import undetected_chromedriver as uc

        return uc.Chrome()
    except ImportError:
        try:
            from selenium import webdriver

            return webdriver.Chrome()
        except ImportError as e:
            raise SystemExit(
                "Browser automation requires selenium/undetected-chromedriver "
                "(not installed in this environment)."
            ) from e


def login_to_pixiv(driver, username: str | None, password: str | None) -> None:
    """Cookie login flow (reference :~? login): open the login page, fill
    credentials if given, otherwise wait for a manual login."""
    driver.get("https://accounts.pixiv.net/login")
    time.sleep(3)
    if username and password:
        By = _by()
        fields = driver.find_elements(By.CSS_SELECTOR, "input[type=text], input[type=password]")
        if len(fields) >= 2:
            fields[0].send_keys(username)
            fields[1].send_keys(password)
            driver.find_element(By.CSS_SELECTOR, "button[type=submit]").click()
    # wait for the session cookie either way
    for _ in range(60):
        if any(c["name"] == "PHPSESSID" for c in driver.get_cookies()):
            return
        time.sleep(2)
    print("Warning: login not confirmed; continuing unauthenticated.")


def mimic_user_interaction(driver, rng: random.Random) -> None:
    """Human-mimicking scroll/focus behavior (reference :~85-150)."""
    for _ in range(rng.randint(2, 5)):
        driver.execute_script(
            f"window.scrollBy(0, {rng.randint(300, 1200)});"
        )
        time.sleep(abs(rng.gauss(0.8, 0.4)))


def get_image_urls_from_page(driver) -> list[str]:
    """Collect master-thumbnail URLs from the current results page."""
    By = _by()
    urls = []
    for img in driver.find_elements(By.TAG_NAME, "img"):
        src = img.get_attribute("src") or ""
        if is_master_thumbnail(src):
            urls.append(src)
    return urls


def download_image(url: str, out_path: str, session=None, retries: int = 3) -> bool:
    import requests

    sess = session or requests
    for attempt in range(retries):
        try:
            r = sess.get(url, headers=REQUEST_HEADERS, timeout=30,
                         allow_redirects=True)
            if r.status_code == 200 and r.content:
                with open(out_path, "wb") as f:
                    f.write(r.content)
                return True
        except Exception as e:
            print(f"download error ({attempt + 1}/{retries}) {url}: {e}")
        time.sleep(random.uniform(1.0, 4.0))
    return False


def crawl_keyword(driver, name: str, keyword: str, out_root: str, limit: int,
                  scheduler, seen: SeenUrls, rng: random.Random) -> int:
    """Crawl one character keyword until ``limit`` images exist on disk."""
    import urllib.parse

    label_dir = os.path.join(out_root, name)
    os.makedirs(label_dir, exist_ok=True)
    count = existing_count(label_dir)
    if count >= limit:
        print(f"{name}: {count} images already present, skipping")
        return count

    page = 1
    next_idx = next_free_index(label_dir)
    dry_streak = 0  # consecutive pages with zero successful downloads
    failures: dict[str, int] = {}  # url -> failed download attempts this run
    while count < limit:
        q = urllib.parse.quote(keyword)
        driver.get(f"https://www.pixiv.net/tags/{q}/artworks?p={page}")
        time.sleep(next(scheduler))
        mimic_user_interaction(driver, rng)
        raw = get_image_urls_from_page(driver)
        if not raw:
            # stop only when the PAGE is empty (end of results). A page
            # whose every thumbnail is already in the seen-set means a
            # resumed run — keep paging, or every restart would abandon the
            # keyword at page 1 forever
            print(f"{name}: page {page} empty, stopping")
            break
        urls = [u for u in raw if u not in seen
                and failures.get(u, 0) < MAX_URL_FAILURES]
        got = 0
        for url in urls:
            if count >= limit:
                break
            out_path = os.path.join(label_dir, f"{next_idx}.jpg")
            if download_image(url, out_path):
                seen.add(url)
                failures.pop(url, None)
                count += 1
                next_idx += 1
                got += 1
            else:
                failures[url] = failures.get(url, 0) + 1
            time.sleep(next(scheduler))
        if got:
            dry_streak = 0
        else:
            # bounded: the site clamps out-of-range ?p= to the LAST results
            # page (non-empty), so an unbounded skip-ahead on a fully-
            # crawled keyword would spin forever — the empty-page stop
            # above never fires. The streak is keyed on successful
            # downloads, so a permanently-404 thumbnail on that clamped
            # page (never added to the seen-set) cannot hold it open.
            dry_streak += 1
            if dry_streak >= MAX_ALL_SEEN_PAGES:
                print(f"{name}: {dry_streak} consecutive pages without a "
                      "download, stopping (keyword exhausted)")
                break
            print(f"{name}: page {page} yielded nothing new, skipping ahead")
        page += 1
    print(f"{name}: {count} images")
    return count


def main(argv=None):
    parser = argparse.ArgumentParser(description="Crawl Pixiv keyword thumbnails")
    parser.add_argument("--target", required=True, help="keyword CSV (name,keyword,cnt)")
    parser.add_argument("--limit", type=int, default=1100, help="images per keyword")
    parser.add_argument("--freq", type=float, default=1.5, help="mean seconds between requests")
    parser.add_argument("--path", default="data/unfiltered", help="output ImageFolder root")
    parser.add_argument("--username", default=None)
    parser.add_argument("--password", default=None)
    parser.add_argument("--popularity", type=int, default=2000)
    parser.add_argument("--always-restart", action="store_true")
    args = parser.parse_args(argv)

    def job():
        rng = random.Random()
        keywords = load_keywords(args.target, args.popularity)
        print(f"{len(keywords)} keywords pass the popularity cutoff")
        seen = SeenUrls(os.path.join(args.path, ".seen_urls"))
        os.makedirs(args.path, exist_ok=True)
        driver = _make_driver()
        try:
            login_to_pixiv(driver, args.username, args.password)
            scheduler = sleep_scheduler(args.freq, rng=rng)
            for name, keyword in keywords:
                crawl_keyword(driver, name, keyword, args.path, args.limit,
                              scheduler, seen, rng)
        finally:
            driver.quit()

    guarder(job, always_restart=args.always_restart)


if __name__ == "__main__":
    main()
