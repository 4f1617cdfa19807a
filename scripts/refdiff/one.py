"""Diff one fuzz seed+op in full: prints doc, frame (if any), and a
minimal structural diff of reference vs ours.

Usage: python scripts/refdiff/one.py SEED [OP]
"""
import json
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import fuzz  # noqa: E402


def jdiff(path, a, b, out):
    if a == b:
        return
    if isinstance(a, dict) and isinstance(b, dict):
        for k in sorted(set(a) | set(b)):
            if k not in a:
                out.append(f"{path}.{k}: ONLY-MINE {json.dumps(b[k])[:160]}")
            elif k not in b:
                out.append(f"{path}.{k}: ONLY-REF {json.dumps(a[k])[:160]}")
            else:
                jdiff(f"{path}.{k}", a[k], b[k], out)
    elif isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            out.append(f"{path}: len ref={len(a)} mine={len(b)}")
            out.append(f"{path}: ref ={json.dumps(a)[:300]}")
            out.append(f"{path}: mine={json.dumps(b)[:300]}")
        else:
            for i, (x, y) in enumerate(zip(a, b)):
                jdiff(f"{path}[{i}]", x, y, out)
    else:
        out.append(f"{path}: ref={json.dumps(a)[:200]} "
                   f"mine={json.dumps(b)[:200]}")


def main():
    seed = int(sys.argv[1])
    ops = [sys.argv[2]] if len(sys.argv) > 2 else ["frame"]
    base = "https://fuzz.example/doc.jsonld"
    doc = fuzz.gen_doc(seed)
    for op in ops:
        op_opts = {"base": base, **fuzz.gen_op_options(seed, op)}
        if op_opts.pop("_omit_base", False):
            op_opts.pop("base", None)
        print("OP OPTS:", json.dumps(op_opts))
        req = {"op": op, "input": doc, "options": dict(op_opts)}
        opts = dict(op_opts)
        if op == "fromRDF":
            nq = fuzz.nquads_for_seed(doc)
            if nq is None:
                print(f"seed {seed} fromRDF: SKIP (doc errors)")
                continue
            req = {"op": op, "input": nq,
                   "options": fuzz.gen_from_rdf_options(seed)}
            opts = dict(fuzz.gen_from_rdf_options(seed))
            opts["_nquads"] = nq
            print("NQUADS:", nq)
            print("OPTS:", json.dumps(req["options"]))
        elif op == "compact":
            req["context"] = doc["@context"]
            opts["_ctx"] = doc["@context"]
        elif op == "compactX":
            xctx = fuzz.gen_doc(2 * seed + 1)["@context"]
            req["op"] = "compact"
            req["context"] = xctx
            opts["_ctx"] = xctx
            print("XCTX:", json.dumps(xctx, indent=1))
        elif op == "flattenC":
            fctx = (doc["@context"] if seed % 2 == 0
                    else fuzz.gen_doc(2 * seed + 1)["@context"])
            req["op"] = "flatten"
            req["context"] = fctx
            opts["_ctx"] = fctx
            print("FCTX:", json.dumps(fctx, indent=1))
        elif op == "corrupt":
            cdoc = fuzz.corrupt_doc(seed)
            req["op"] = "expand"
            req["input"] = cdoc
            opts["_seed"] = seed
            print("CORRUPT DOC:", json.dumps(cdoc, indent=1))
        elif op == "merge":
            pair = [doc, fuzz.gen_doc(3 * seed + 2)]
            import random as _r
            rng = _r.Random(seed * 41 + 17)
            r = rng.random()
            mctx = None if r < 0.5 else (
                doc["@context"] if r < 0.75
                else fuzz.gen_doc(2 * seed + 1)["@context"])
            req["input"] = pair
            if mctx is not None:
                req["context"] = mctx
                opts["_ctx"] = mctx
            opts["_docs"] = pair
            print("DOC2:", json.dumps(pair[1], indent=1))
            print("MCTX:", json.dumps(mctx, indent=1))
        elif op == "compactE":
            exp = fuzz.expanded_for_seed(doc)
            if exp is None:
                print(f"seed {seed} compactE: SKIP (doc errors)")
                continue
            ectx = (doc["@context"] if seed % 2 == 0
                    else fuzz.gen_doc(2 * seed + 1)["@context"])
            req["op"] = "compact"
            req["input"] = exp
            req["context"] = ectx
            req["options"]["skipExpansion"] = True
            opts["_ctx"] = ectx
            opts["_expanded"] = exp
            opts["skipExpansion"] = True
            print("ECTX:", json.dumps(ectx, indent=1))
        elif op == "link":
            lctx = fuzz.link_ctx(seed, {seed: doc},
                                 {seed: fuzz.gen_doc(
                                     2 * seed + 1)["@context"]})
            if lctx is not None:
                req["context"] = lctx
            opts["_ctx"] = lctx
            print("LCTX:", json.dumps(lctx, indent=1))
        elif op == "nodeMap":
            pass  # plain input, no extra operands
        elif op == "canonize":
            if seed % 4 == 0:
                nq = fuzz.nquads_for_seed(doc)
                if nq is not None:
                    req["input"] = nq
                    req["options"]["inputFormat"] = "application/n-quads"
                    opts["inputFormat"] = "application/n-quads"
                    opts["_nquads"] = nq
                    print("NQUADS:", nq)
        elif op in ("frame", "frameX", "frameC"):
            fr = fuzz.gen_frame(
                seed, fuzz.gen_doc(2 * seed + 1) if op == "frameX"
                else doc)
            if op == "frameC":
                fr = fuzz.corrupt_frame(seed, fr)
            req["op"] = "frame"
            req["frame"] = fr
            opts["_frame"] = fr
            print("FRAME:", json.dumps(fr, indent=1))
        ref = fuzz.run_reference([req])[0]
        mine = fuzz.run_mine(op, doc, opts)
        print("DOC:", json.dumps(doc, indent=1))
        if fuzz.compare(op, ref, mine):
            print(f"seed {seed} {op}: MATCH")
            continue
        out: list = []
        if "result" in ref and "result" in mine:
            jdiff("$", ref["result"], mine["result"], out)
            print(f"seed {seed} {op}: DIVERGE")
            print("\n".join(out))
        else:
            print(f"seed {seed} {op}: DIVERGE (error-presence)")
            print(" ref :", json.dumps(ref)[:400])
            print(" mine:", json.dumps(mine)[:400])


if __name__ == "__main__":
    main()
