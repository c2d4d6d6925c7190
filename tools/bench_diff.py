#!/usr/bin/env python3
"""Round-over-round bench comparison: per-query wall-time diff between two
bench artifacts, so regressions are machine-checked instead of eyeballed.

Usage: python3 tools/bench_diff.py <old> <new> [--threshold 1.5]

Accepts any of the three artifact shapes that exist in this repo:
  - the bare bench JSON line Bench.scala prints (and writes to
    target/bench.json): {"metric":"total",...,"queries":{name:sec,...}}
  - the driver's BENCH_rN.json wrapper with a non-null "parsed" field
  - the driver wrapper with parsed=null: per-query times are scraped
    from the truncated "tail" string (pairs it cut off are skipped —
    the tool says how many names it recovered)

Prints total/count deltas, the worst regressions above the threshold,
the best improvements, and queries present on one side only.
"""
import json, re, sys


def load_queries(path):
    with open(path) as f:
        raw = f.read()
    if not raw.lstrip().startswith('{'):
        # raw sbt log capture: find the bench JSON line behind its prefix
        i = raw.find('{"metric"')
        if i < 0:
            sys.exit(f'{path}: no bench JSON found (expected a line '
                     'containing {"metric"...} or a plain JSON file)')
        # parse from the match onward; trailing log lines after the JSON
        # object are tolerated via raw_decode
        d, _ = json.JSONDecoder().raw_decode(raw[i:])
        return d.get('value'), d.get('queries', {})
    d = json.loads(raw)
    if 'queries' in d and isinstance(d['queries'], dict):
        return d.get('value'), d['queries']
    p = d.get('parsed')
    if isinstance(p, dict) and isinstance(p.get('queries'), dict):
        return p.get('value'), p['queries']
    # driver wrapper with parsed=null: scrape the truncated tail. Match
    # both the summary form "name":1.23 and the passes form
    # "name":[1.2,0.9] (taking the min, same as the summary).
    tail = d.get('tail', '')
    q = {}
    for m in re.finditer(r'"([a-z0-9_]+)":(\d+\.\d+)', tail):
        q.setdefault(m.group(1), float(m.group(2)))
    for m in re.finditer(r'"([a-z0-9_]+)":\[([\d.,]+)\]', tail):
        q.setdefault(m.group(1), min(float(x) for x in m.group(2).split(',')))
    for k in ('metric', 'value', 'sf', 'warmup_s', 'tables', 'codegen_jit',
              'mllib_jit', 'text_kernel_jit', 'lsh_pipeline_jit'):
        q.pop(k, None)
    print(f'[{path}] parsed=null: recovered {len(q)} query times from tail')
    return None, q


def main():
    thr = 1.5
    args = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith('--threshold'):
            if '=' in a:
                thr = float(a.split('=', 1)[1])
            else:
                thr = float(argv[i + 1])
                i += 1  # consume the value so it never lands in args
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(f'usage: bench_diff.py <old> <new> [--threshold N] (got {args})')
    old_path, new_path = args
    old_total, old = load_queries(old_path)
    new_total, new = load_queries(new_path)

    common = sorted(set(old) & set(new))
    print(f'old: {len(old)} queries' + (f', total {old_total:.1f}s' if old_total is not None else ''))
    print(f'new: {len(new)} queries' + (f', total {new_total:.1f}s' if new_total is not None else ''))
    if common:
        so, sn = sum(old[q] for q in common), sum(new[q] for q in common)
        print(f'common set ({len(common)}): {so:.1f}s -> {sn:.1f}s ({sn / so:.2f}x)')

    regress = [(new[q] / old[q], q) for q in common
               if new[q] > old[q] * thr and new[q] - old[q] > 0.05]
    improve = [(old[q] / new[q], q) for q in common
               if old[q] > new[q] * thr and old[q] - new[q] > 0.05]
    for title, rows in ((f'regressions >{thr}x', sorted(regress, reverse=True)),
                        (f'improvements >{thr}x', sorted(improve, reverse=True))):
        print(f'-- {title}: {len(rows)}')
        for ratio, q in rows[:15]:
            print(f'   {q}: {old[q]:.2f}s -> {new[q]:.2f}s ({ratio:.1f}x)')
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f'-- removed ({len(only_old)}): {" ".join(only_old)}')
    if only_new:
        print(f'-- added ({len(only_new)}): {" ".join(only_new)}')
    sys.exit(1 if regress else 0)


if __name__ == '__main__':
    main()
