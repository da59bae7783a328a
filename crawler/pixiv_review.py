"""Local (offline) image review GUI.

Capability parity with ``/root/reference/crawler/pixiv_review.py``: a tkinter
side-by-side reference-vs-candidate reviewer over an ImageFolder tree —
keyboard shortcuts (a/enter = keep, d/x = mark ``.invalid``, u/z = undo,
q = quit), rejection by renaming to ``.invalid``, a JSON progress file so a
review session resumes where it stopped, and a bounded undo history (50).

tkinter is imported lazily (not present in this image); everything except the
event loop is plain-filesystem logic shared with the reviewer web app's
conventions (``0.jpg`` = reference image per label).
"""
from __future__ import annotations

import json
import os

UNDO_LIMIT = 50
PROGRESS_FILE = "review_progress.json"


class ReviewState:
    """Filesystem + progress logic, UI-independent (testable)."""

    def __init__(self, data_dir: str, progress_file: str = PROGRESS_FILE):
        self.data_dir = data_dir
        self.progress_file = progress_file
        self.items: list[tuple[str, str]] = []  # (label, path)
        for label in sorted(os.listdir(data_dir)):
            ldir = os.path.join(data_dir, label)
            if not os.path.isdir(ldir):
                continue
            for f in sorted(os.listdir(ldir)):
                if f == "0.jpg" or not f.lower().endswith((".jpg", ".jpeg", ".png")):
                    continue
                self.items.append((label, os.path.join(ldir, f)))
        self.pos = 0
        self.history: list[tuple[str, str]] = []  # (old_path, new_path)
        self._load_progress()

    # -- progress ----------------------------------------------------------

    def _load_progress(self):
        if os.path.exists(self.progress_file):
            with open(self.progress_file) as f:
                data = json.load(f)
            if data.get("data_dir") == self.data_dir:
                nxt = data.get("next_path")
                if nxt is not None:
                    # Resume by the PATH of the next unreviewed item, not a
                    # raw index: a rebuilt items list excludes the previous
                    # session's rejections (now .invalid), so a stored index
                    # would point past — and silently skip — unreviewed
                    # images. items iterates in path sort order, so the
                    # first path >= nxt is the true resume point.
                    self.pos = len(self.items)
                    for i, (_label, p) in enumerate(self.items):
                        if p >= nxt:
                            self.pos = i
                            break
                else:  # legacy index-only progress file
                    self.pos = min(int(data.get("pos", 0)), len(self.items))

    def save_progress(self):
        nxt = self.items[self.pos][1] if self.pos < len(self.items) else None
        with open(self.progress_file, "w") as f:
            json.dump({"data_dir": self.data_dir, "pos": self.pos,
                       "next_path": nxt}, f)

    # -- review actions ----------------------------------------------------

    def current(self) -> tuple[str, str] | None:
        while self.pos < len(self.items):
            label, path = self.items[self.pos]
            if os.path.exists(path):
                return label, path
            self.pos += 1
        return None

    def reference_for(self, label: str) -> str | None:
        ref = os.path.join(self.data_dir, label, "0.jpg")
        return ref if os.path.exists(ref) else None

    def keep(self):
        self.pos += 1
        self.save_progress()

    def reject(self):
        cur = self.current()
        if cur is None:
            return
        _label, path = cur
        new_path = os.path.splitext(path)[0] + ".invalid"
        os.rename(path, new_path)
        self.history.append((path, new_path))
        self.history = self.history[-UNDO_LIMIT:]
        self.pos += 1
        self.save_progress()

    def undo(self):
        self.pos = max(0, self.pos - 1)
        if self.history:
            old_path, new_path = self.history[-1]
            # only revert a rename if the undone position was a rejection
            label, path = self.items[self.pos]
            if path == old_path and os.path.exists(new_path):
                os.rename(new_path, old_path)
                self.history.pop()
        self.save_progress()

    def progress(self) -> tuple[int, int]:
        return self.pos, len(self.items)


class ImageReviewSystem:
    """tkinter shell over :class:`ReviewState` (reference :12-278)."""

    def __init__(self, data_dir: str):
        import tkinter as tk

        from PIL import Image, ImageTk

        self.tk, self.Image, self.ImageTk = tk, Image, ImageTk
        self.state = ReviewState(data_dir)
        self.root = tk.Tk()
        self.root.title("Pixiv dataset review")
        self.status = tk.Label(self.root, font=("sans", 12))
        self.status.pack()
        frame = tk.Frame(self.root)
        frame.pack()
        self.ref_panel = tk.Label(frame, text="reference")
        self.ref_panel.pack(side="left", padx=8)
        self.img_panel = tk.Label(frame, text="candidate")
        self.img_panel.pack(side="left", padx=8)
        for keys, fn in ((("a", "<Return>"), self._keep),
                         (("d", "x"), self._reject),
                         (("u", "z"), self._undo),
                         (("q",), lambda e: self.root.destroy())):
            for k in keys:
                self.root.bind(k, fn)
        self._refresh()

    def _show(self, panel, path):
        if path is None:
            panel.configure(image="", text="(none)")
            return
        im = self.Image.open(path)
        im.thumbnail((420, 420))
        photo = self.ImageTk.PhotoImage(im)
        panel.configure(image=photo, text="")
        panel.image = photo

    def _refresh(self):
        cur = self.state.current()
        done, total = self.state.progress()
        if cur is None:
            self.status.configure(text=f"Done! {done}/{total}")
            self._show(self.img_panel, None)
            return
        label, path = cur
        self.status.configure(
            text=f"{label} — {os.path.basename(path)} ({done}/{total}) "
            "[a=keep d=reject u=undo q=quit]"
        )
        self._show(self.ref_panel, self.state.reference_for(label))
        self._show(self.img_panel, path)

    def _keep(self, _e=None):
        self.state.keep()
        self._refresh()

    def _reject(self, _e=None):
        self.state.reject()
        self._refresh()

    def _undo(self, _e=None):
        self.state.undo()
        self._refresh()

    def run(self):
        self.root.mainloop()


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Review crawled images locally")
    parser.add_argument("--data-dir", default="data/unfiltered")
    args = parser.parse_args()
    ImageReviewSystem(args.data_dir).run()
