"""Long-lived HTTP scoring server over a trained survival results dir.

TPU-native serving extension (the reference has no serving path at all; its
closest surface is re-evaluating its own test splits).  Where the one-shot
``utils.predict.predict`` bootstraps everything per invocation, this server
loads once and stays warm:

- fold checkpoints + model graphs load ONCE at startup; the jitted eval step
  per fold is created once and reused, so the first request at a new bag
  shape pays the XLA compile and every later request is pure device
  execution (combine with training-time ``--bucket_patches`` so production
  slides hit a handful of compiled shapes),
- the alignment checkpoint (when the config names one) loads once
  (``utils/results_io.load_alignment``),
- requests serialize on a lock — one device, one queue; the HTTP layer
  itself is threaded so health checks never block behind scoring.

Protocol (JSON over HTTP, stdlib only):

    GET  /health    -> {"status": "ok", "folds": [...], "model_type": ...}
    POST /predict   {"cases": [{"patient_id", "case_id", "h5_file_path",
                                ("label")}, ...],
                     "drop_prob": optional float, "seed": optional int}
                    -> same row schema as ``predictions.csv``
                       (ensembled probs/risk + per-fold prob_1)

The h5 paths resolve against the server's ``--data_root_dir`` exactly as in
training — the deployment assumption is slides landing on shared storage.
"""

from __future__ import annotations

import json
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from multimodal_fusion_tpu.utils.jaxcache import guard_cpu_compile_cache


class ScoringServer:
    """Trained-results-dir scorer with fold state cached across requests."""

    def __init__(
        self,
        results_dir: str | Path,
        data_root_dir: str | Path,
        folds: Optional[Sequence[int]] = None,
    ):
        from multimodal_fusion_tpu.train.checkpoint import load_state
        from multimodal_fusion_tpu.train.survival import SurvivalTrainer
        from multimodal_fusion_tpu.utils.results_io import (
            discover_folds,
            load_alignment,
            load_configs,
        )

        self.results_dir = Path(results_dir)
        self.data_root_dir = data_root_dir
        self.configs = load_configs(self.results_dir)
        self.trainer = SurvivalTrainer(self.configs, self.results_dir)
        self.folds = list(folds) if folds else discover_folds(self.results_dir)
        if not self.folds:
            raise FileNotFoundError(
                f"no s_<fold>_checkpoint.npz in {self.results_dir}"
            )
        self.align = load_alignment(self.configs)
        self._lock = threading.Lock()
        self._fold_state: Dict[int, tuple] = {}
        from flax import nnx

        for fold in self.folds:
            model, graphdef, params, rest = self.trainer._build_model(fold)
            restored, _ = load_state(
                self.results_dir / f"s_{fold}_checkpoint.npz",
                {"params": params, "rest": rest},
            )
            # point the retained model object at the RESTORED arrays — the
            # freshly-initialized weights otherwise stay reachable for the
            # server's lifetime purely as ballast (k folds of duplicate
            # parameter memory)
            nnx.update(model, restored["params"], restored["rest"])
            self._fold_state[fold] = (
                model, graphdef, restored["params"], restored["rest"],
            )
        # (fold, drop_prob) -> jitted eval step, LRU-bounded: drop_prob is
        # CLIENT-supplied, so an unbounded dict would let a robustness sweep
        # (or any misbehaving client) pin compiled executables without limit
        from collections import OrderedDict

        self._eval_steps: "OrderedDict[tuple, object]" = OrderedDict()
        self._eval_steps_max = 4 * len(self.folds)
        self.stats = {"requests": 0, "cases_scored": 0, "busy_seconds": 0.0}

    def _eval_step(self, fold: int, drop_prob: Optional[float]):
        key = (fold, drop_prob)
        if key not in self._eval_steps:
            model, graphdef, _, _ = self._fold_state[fold]
            self._eval_steps[key] = self.trainer._make_eval_step(
                model, graphdef, drop_prob=drop_prob
            )
            while len(self._eval_steps) > self._eval_steps_max:
                self._eval_steps.popitem(last=False)
        else:
            self._eval_steps.move_to_end(key)
        return self._eval_steps[key]

    @guard_cpu_compile_cache  # trainer-sized executables segfault XLA:CPU's
    # persistent-cache (de)serialization in aged processes (see jaxcache);
    # this path compiles eval steps outside the guarded evaluate_fold
    def score_rows(
        self,
        rows: List[Dict],
        drop_prob: Optional[float] = None,
        seed: int = 0,
    ) -> Dict:
        """Score request rows ([{patient_id, case_id, h5_file_path, ...}])
        through every cached fold; mean-probability ensemble."""
        import jax

        from multimodal_fusion_tpu.utils.predict import ensemble_rows
        from multimodal_fusion_tpu.utils.results_io import build_dataset

        if not rows:
            raise ValueError("request contains no cases")
        if not all(isinstance(r, dict) for r in rows):
            raise ValueError("'cases' must be a list of objects")
        for col in ("patient_id", "case_id", "h5_file_path"):
            if any(col not in r for r in rows):
                raise ValueError(f"every case row needs a {col!r} field")
        df = pd.DataFrame(rows)
        if "label" not in df.columns:
            df["label"] = "unknown"
        else:
            df["label"] = df["label"].fillna("unknown")
        tmp = tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False)
        tmp.close()
        try:
            df.to_csv(tmp.name, index=False)
            dataset = build_dataset(
                self.configs, tmp.name, self.data_root_dir, align=self.align
            )
        finally:
            Path(tmp.name).unlink(missing_ok=True)
        if len(dataset) == 0:
            raise ValueError(
                "no scoreable cases: every row was filtered by the dataset "
                f"layer (missing h5 files or channels?); input rows={len(df)}"
            )
        idx = np.arange(len(dataset))
        per_fold: Dict[int, Dict] = {}
        with self._lock:
            import time

            t0 = time.perf_counter()
            for fold in self.folds:
                _, _, params, rest = self._fold_state[fold]
                res = self.trainer._evaluate(
                    dataset, idx, self._eval_step(fold, drop_prob),
                    params, rest, jax.random.key(seed),
                )
                per_fold[fold] = {
                    "patient_ids": res["patient_ids"],
                    "probs": res["probs"].tolist(),
                    "risk": res["risk"].tolist(),
                }
            self.stats["requests"] += 1
            self.stats["cases_scored"] += len(idx)
            self.stats["busy_seconds"] += time.perf_counter() - t0
        out = ensemble_rows(per_fold, self.folds, dataset.case_to_patient)
        return {
            "cases": out,
            "folds": list(self.folds),
            "n_cases_scored": len(out),
            "n_cases_input": len(rows),
            "drop_prob": drop_prob,
        }


class _Handler(BaseHTTPRequestHandler):
    server_version = "mmf-tpu-serve/1.0"

    def _json(self, code: int, payload: Dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default (log-friendly CLIs)
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def do_GET(self):
        if self.path == "/health":
            scorer: ScoringServer = self.server.scorer
            self._json(200, {
                "status": "ok",
                "folds": list(scorer.folds),
                "model_type": scorer.configs.model_config.get("model_type"),
                **scorer.stats,
            })
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    MAX_BODY_BYTES = 64 * 1024 * 1024  # requests carry row METADATA (ids +
    # h5 paths), not features — 64 MB of JSON rows is already ~100k cases

    def do_POST(self):
        if self.path != "/predict":
            self._json(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            if n > self.MAX_BODY_BYTES:
                self._json(413, {
                    "error": f"request body {n} bytes exceeds "
                    f"{self.MAX_BODY_BYTES} (send case metadata, not features)"
                })
                return
            body = json.loads(self.rfile.read(n) or b"{}")
            if not isinstance(body, dict):
                raise ValueError("request body must be a JSON object")
            cases = body.get("cases") or []
            if not isinstance(cases, list):
                raise ValueError("'cases' must be a list of objects")
            drop = body.get("drop_prob")
            res = self.server.scorer.score_rows(
                cases,
                drop_prob=None if drop is None else float(drop),
                seed=int(body.get("seed", 0)),
            )
            self._json(200, res)
        except (ValueError, TypeError, KeyError, FileNotFoundError,
                json.JSONDecodeError) as e:
            self._json(400, {"error": str(e)})
        except Exception as e:  # scoring must never kill the server
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(
    results_dir: str | Path,
    data_root_dir: str | Path,
    host: str = "127.0.0.1",
    port: int = 0,
    folds: Optional[Sequence[int]] = None,
    verbose: bool = False,
) -> ThreadingHTTPServer:
    """Bound-but-not-serving HTTP server (call ``serve_forever()``); loads
    all fold state eagerly so startup fails fast on a bad results dir.
    ``port=0`` binds an ephemeral port (``server.server_address[1]``)."""
    scorer = ScoringServer(results_dir, data_root_dir, folds=folds)
    httpd = ThreadingHTTPServer((host, port), _Handler)
    httpd.scorer = scorer
    httpd.verbose = verbose
    return httpd
