"""HTTP retrieval server over a descriptor index (stdlib only).

Wraps openibl_tpu.serving.RetrievalService: model warm, index HBM-resident.

  python examples/index_and_query.py build gallery/ index.npz --weights w.pth
  python examples/serve.py index.npz --weights w.pth --port 8080

  GET  /healthz            -> {"ok": true, "index_size": N}
  POST /query?topk=5       -> body = image bytes (jpeg/png/...);
                              response = JSON match list
"""

import argparse
import io
import json
import os.path as osp
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def make_handler(service):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                return self._json(
                    200, {"ok": True, "index_size": service.index_size}
                )
            return self._json(404, {"error": "unknown path"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/query":
                return self._json(404, {"error": "unknown path"})
            try:
                topk = int(parse_qs(url.query).get("topk", ["10"])[0])
                length = int(self.headers.get("Content-Length", 0))
                from PIL import Image

                img = Image.open(io.BytesIO(self.rfile.read(length)))
            except Exception as e:  # noqa: BLE001 - malformed request
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})
            try:
                matches = service.query([img], topk=topk)[0]
            except ValueError as e:  # bad image shape/dtype = client error
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # noqa: BLE001 — device/model failure:
                # a 500 so load balancers retry/alert instead of treating a
                # backend outage as a bad request
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})
            return self._json(200, {"matches": matches})

        def log_message(self, fmt, *args):  # quiet default access log
            pass

    return Handler


def main():
    p = argparse.ArgumentParser(description="retrieval HTTP server (TPU)")
    p.add_argument("index", help="index .npz from index_and_query.py build")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--pca-params", type=str, default=None,
                   help="PCA-whitening .h5/.npz for trainer checkpoints "
                        "(auto-discovered next to the checkpoint if omitted)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--n-devices", type=int, default=0,
                   help=">0 shards the index over a data mesh of that size")
    p.add_argument("--int8", action="store_true",
                   help="quantize a float index to int8 at load "
                        "(quarter-width in HBM; int8-built indexes are "
                        "detected automatically)")
    p.add_argument("--ivf-nprobe", type=int, default=0,
                   help=">0 probes only that many IVF cells per query "
                        "(approximate, ~nlist/nprobe less HBM traffic; "
                        "index must be built with --ivf-nlist)")
    p.add_argument("--pq", action="store_true",
                   help="serve from the index's product-quantized codes "
                        "(build --pq-m; ~256x smaller in HBM at m=64, "
                        "exhaustive-ADC search). Implied for --pq-only "
                        "indexes; combine with --ivf-nprobe for IVFADC "
                        "(residual codes, probed cell-by-cell)")
    p.add_argument("--pq-rerank", type=int, default=0,
                   help=">0 = ADC shortlist of this size over the PQ "
                        "codes, exact re-rank against the full-width "
                        "descriptors (index needs --pq-m without "
                        "--pq-only): exact-quality results reading "
                        "~D*dtype/m x less index per query")
    p.add_argument("--quant-backbone", action="store_true",
                   help="run the conv backbone mixed bf16/int8 "
                        "(openibl_tpu/ops/quant.py; descriptor cosine vs "
                        "f32 >0.999, conv blocks 1.2-1.4x faster on the "
                        "MXU int8 path)")
    args = p.parse_args()

    from openibl_tpu.serving import RetrievalService

    mesh = None
    if args.n_devices:
        from openibl_tpu.parallel.mesh import get_mesh

        mesh = get_mesh(args.n_devices)
    service = RetrievalService(args.index, weights=args.weights,
                               height=args.height, width=args.width,
                               mesh=mesh, quantize_int8=args.int8,
                               ivf_nprobe=args.ivf_nprobe,
                               pca_params=args.pca_params,
                               quant_backbone=args.quant_backbone,
                               use_pq=args.pq, pq_rerank=args.pq_rerank)
    print(f"warming {len(service.buckets)} batch buckets over "
          f"{service.index_size}-image index ...")
    service.warmup()
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"serving on http://{args.host}:{args.port}  (POST /query, "
          f"GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
