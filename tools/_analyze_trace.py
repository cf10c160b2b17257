import glob, gzip, json, collections
path = sorted(glob.glob("/tmp/beamtrace/plugins/profile/*/vm.trace.json.gz"))[-1]
with gzip.open(path) as f:
    data = json.load(f)
events = data.get("traceEvents", [])
tot = collections.Counter()
cnt = collections.Counter()
for e in events:
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", "?")
        tot[name] += e["dur"]
        cnt[name] += 1
print(f"{'us_total':>12} {'count':>7}  name")
for name, us in tot.most_common(40):
    print(f"{us:12.0f} {cnt[name]:7d}  {name[:140]}")
