"""Aux tooling: sha check, dataset sampler, crawler pure logic, review state,
augmentation visualizer."""
import os

import numpy as np
import pytest
from PIL import Image

from fixtures import make_image_folder


def test_check_sha(tmp_path):
    from touhouimageclassification_tpu.utils.check_sha import check_folder

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "a").mkdir(parents=True)
    (dst / "a").mkdir(parents=True)
    (src / "a" / "1.bin").write_bytes(b"same-content")
    (dst / "a" / "x.bin").write_bytes(b"same-content")   # duplicate content
    (dst / "a" / "y.bin").write_bytes(b"different")
    dup, uniq = check_folder(str(src), str(dst))
    assert len(dup) == 1 and dup[0].endswith("x.bin")
    assert len(uniq) == 1 and uniq[0].endswith("y.bin")


def test_sample_dataset_and_reference(tmp_path):
    from touhouimageclassification_tpu.utils.sample_dataset import (
        add_reference, del_reference, sample_dataset,
    )

    src = make_image_folder(str(tmp_path / "src"), num_classes=3, per_class=10, size=8)
    dst = str(tmp_path / "dst")
    n = sample_dataset(src, dst, p=0.5, seed=0)
    assert 5 <= n <= 25  # ~15 expected
    add_count = add_reference(src, dst)
    assert add_count == 3
    assert os.path.exists(os.path.join(dst, "class_00", "0.jpg"))
    assert del_reference(dst) == 3


def test_crawler_url_criteria():
    from crawler.pixiv_crawl import is_master_thumbnail, thumbnail_to_image_id

    good = ("https://i.pximg.net/c/250x250_80_a2/img-master/img/2024/01/02/"
            "00/00/00/12345678_p0_square1200.jpg")
    assert is_master_thumbnail(good)
    assert thumbnail_to_image_id(good) == "12345678"
    assert not is_master_thumbnail("https://example.com/img-master/1_p0_master.jpg")
    assert not is_master_thumbnail("https://i.pximg.net/img-original/1_p1.jpg")


def test_crawler_keyword_filter(tmp_path):
    from crawler.pixiv_crawl import load_keywords

    csv_path = tmp_path / "kw.csv"
    csv_path.write_text("name,keyword,cnt\nreimu,霊夢,116982\nnobody,x,50\n",
                        encoding="utf-8")
    kws = load_keywords(str(csv_path), popularity=2000)
    assert kws == [("reimu", "霊夢")]


def test_crawler_scheduler_and_seen(tmp_path):
    import random

    from crawler.pixiv_crawl import SeenUrls, sleep_scheduler

    sched = sleep_scheduler(freq=1.0, long_pause_every=5, long_pause=30.0,
                            rng=random.Random(0))
    sleeps = [next(sched) for _ in range(10)]
    assert all(s > 0 for s in sleeps)
    assert max(sleeps) >= 30.0        # the periodic long pause fires
    assert min(sleeps) < 3.0

    seen = SeenUrls(str(tmp_path / "seen.txt"))
    seen.add("u1")
    assert "u1" in seen
    reloaded = SeenUrls(str(tmp_path / "seen.txt"))
    assert "u1" in reloaded and "u2" not in reloaded


def test_name_processing():
    from crawler.th_name_process import find_count, find_related_tag, process_name

    names = list(process_name("霧雨　魔理沙"))
    assert "霧雨　魔理沙" in names and "霧雨魔理沙" in names and "魔理沙" in names
    assert find_count("東方Projectのイラストは116,982件あります") == 116982
    assert find_count("no count here") == -1
    assert find_related_tag("related to 东方Project art", "东方Project")
    # slash variants yield both sides (reference bug fixed)
    both = list(process_name("A/B"))
    assert "A" in both and "B" in both


def test_review_state(tmp_path):
    from crawler.pixiv_review import ReviewState

    data = make_image_folder(str(tmp_path / "rv"), num_classes=2, per_class=3, size=8)
    # add reference images
    for label in os.listdir(data):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            os.path.join(data, label, "0.jpg"))
    progress = str(tmp_path / "progress.json")
    st = ReviewState(data, progress)
    total = st.progress()[1]
    assert total == 4  # per-class files 1.jpg, 2.jpg (0.jpg = reference, excluded)
    cur = st.current()
    assert cur is not None
    st.keep()
    st.reject()
    invalids = [f for _, _, fs in os.walk(data) for f in fs if f.endswith(".invalid")]
    assert len(invalids) == 1
    st.undo()
    invalids = [f for _, _, fs in os.walk(data) for f in fs if f.endswith(".invalid")]
    assert len(invalids) == 0

    # progress persists
    st.keep(); st.keep()
    st2 = ReviewState(data, progress)
    assert st2.pos == st.pos


def test_aug_visualizer(tmp_path):
    from touhouimageclassification_tpu.analysis.aug import visualize

    img = tmp_path / "x.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (64, 64, 3)).astype(np.uint8)
    ).save(img)
    out = visualize(str(img), str(tmp_path / "grid"), out_size=(32, 32))
    assert len(out) == 4
    for p in out:
        assert os.path.exists(p)
        with Image.open(p) as im:
            assert im.size[0] >= 32


def test_shipped_label_tables_carry_the_120_class_space():
    """The shipped data tables (ported from the reference: th_name_raw 161
    rows CH/JP/EN, lang map 162 rows, processed keyword splits) must
    reproduce the documented 120-class contract: exactly 120 keywords pass
    the crawler's default popularity cutoff of 2000 across the two
    processed splits (TIC report §2; crawler --popularity default)."""
    import csv

    root = os.path.join(os.path.dirname(__file__), "..")

    def rows(path):
        with open(os.path.join(root, path), newline="") as f:
            return list(csv.DictReader(f))

    raw = rows("crawler/th_name_raw.csv")
    assert len(raw) >= 160 and set(raw[0]) == {"CH", "JP", "EN"}
    lang = rows("web/th_name_lang_map.csv")
    assert len(lang) >= 160 and set(lang[0]) == {"CN", "JP", "EN"}

    kept = [
        r for p in ("crawler/th_name_processed_1.csv",
                    "crawler/th_name_processed_2.csv")
        for r in rows(p) if int(r["cnt"]) >= 2000
    ]
    assert len(kept) == 120
    assert len({r["keyword"] for r in kept}) == 120  # no duplicate keywords

    # the crawler's own loader applies the same cutoff
    from crawler.pixiv_crawl import load_keywords
    n = 0
    for p in ("crawler/th_name_processed_1.csv", "crawler/th_name_processed_2.csv"):
        n += len(load_keywords(os.path.join(root, p), popularity=2000))
    assert n == 120

    # pretest fixture: a bare keyword list for crawler dry runs
    with open(os.path.join(root, "crawler/th_name_pretest.csv")) as f:
        pre = [l.strip() for l in f if l.strip()]
    assert pre[0] == "keyword" and len(pre) == 12


def test_review_state_resume_after_rejections(tmp_path):
    """Resume is path-keyed, not index-keyed: the rebuilt items list excludes
    the prior session's rejections, so a raw index would silently skip
    unreviewed images."""
    from PIL import Image

    import numpy as np

    from crawler.pixiv_review import ReviewState

    d = tmp_path / "data" / "char"
    d.mkdir(parents=True)
    for i in range(1, 7):
        Image.fromarray(np.full((8, 8, 3), i, np.uint8)).save(d / f"{i}.jpg")
    progress = str(tmp_path / "progress.json")

    st = ReviewState(str(tmp_path / "data"), progress)
    assert st.progress() == (0, 6)
    st.reject()   # 1.jpg -> .invalid
    st.reject()   # 2.jpg -> .invalid
    st.keep()     # 3.jpg stays

    st2 = ReviewState(str(tmp_path / "data"), progress)
    # items now exclude the two .invalid files (4 left); the next unreviewed
    # image is 4.jpg — an index resume would have pointed at 6.jpg
    label, path = st2.current()
    assert os.path.basename(path) == "4.jpg"
    assert st2.progress() == (1, 4)


def test_crawler_next_free_index(tmp_path):
    """Non-contiguous numbering (review renamed some to .invalid) must not
    make the crawler overwrite kept images."""
    from crawler.pixiv_crawl import existing_count, next_free_index

    d = tmp_path / "char"
    d.mkdir()
    for i in (0, 1, 2, 70, 99):
        (d / f"{i}.jpg").write_bytes(b"x")
    (d / "3.invalid").write_bytes(b"x")
    assert existing_count(str(d)) == 5
    # count=5 would have clobbered 70.jpg; the free index is past ALL stems
    assert next_free_index(str(d)) == 100
    assert next_free_index(str(tmp_path / "missing")) == 0


class _TagPageDriver:
    """Fake selenium driver for the tag-count scrape: serves a meta
    description per tag URL (th_name_process.get_illust_description_by_tag
    reads only page_source after get + scrolls)."""

    def __init__(self, descriptions):
        self.descriptions = descriptions
        self.tag = None

    def get(self, url):
        # .../tags/<tag>/artworks
        self.tag = url.rstrip("/").split("/")[-2]

    def execute_script(self, script):
        pass

    @property
    def page_source(self):
        des = self.descriptions.get(self.tag, "")
        return f'<html><head><meta name="description" content="{des}">' \
               f"</head><body></body></html>"


def test_th_name_scrape_picks_max_count_franchise_tag(tmp_path, monkeypatch):
    """The preprocessor keeps, per character row, the candidate tag with the
    most artworks whose description mentions the franchise tag
    (reference crawler/th_name_process.py main loop)."""
    import crawler.th_name_process as tnp

    monkeypatch.setattr(tnp.time, "sleep", lambda s: None)
    driver = _TagPageDriver({
        "博丽灵梦": "东方Project 的作品有1,200件",
        "霊夢": "东方Project 的作品有3,400件",
        "reimu": "unrelated page with 9999件",  # no franchise tag -> ignored
        "雾雨魔理沙": "东方Project 的作品有50件",
    })
    rows = [
        {"CH": "博丽灵梦", "JP": "霊夢", "EN": "reimu"},
        {"CH": "雾雨魔理沙", "JP": "", "EN": ""},
    ]
    out_csv = tmp_path / "processed.csv"
    out = tnp.filter_tags_by_count_and_related_tags_saving_to(
        rows, "东方Project", str(out_csv), driver=driver)
    assert out == [
        {"name": "博丽灵梦", "keyword": "霊夢", "cnt": 3400},
        {"name": "雾雨魔理沙", "keyword": "雾雨魔理沙", "cnt": 50},
    ]
    lines = out_csv.read_text(encoding="utf-8").splitlines()
    assert lines[0] == "name,keyword,cnt"
    assert lines[1] == "博丽灵梦,霊夢,3400"


def test_th_name_preprocess_end_to_end(tmp_path, monkeypatch):
    import crawler.th_name_process as tnp

    monkeypatch.setattr(tnp.time, "sleep", lambda s: None)
    raw = tmp_path / "raw.csv"
    raw.write_text("CH,JP,EN\n东风谷早苗,早苗,sanae\n", encoding="utf-8")
    driver = _TagPageDriver({"早苗": "东方Project 的作品有77件"})
    monkeypatch.setattr(tnp, "_make_driver", lambda: driver)
    target = tmp_path / "processed.csv"
    tnp.preprocess("东方Project", str(raw), str(target))
    assert "东风谷早苗,早苗,77" in target.read_text(encoding="utf-8")
