import glob, gzip, json
path = sorted(glob.glob("/tmp/beamtrace/plugins/profile/*/vm.trace.json.gz"))[-1]
with gzip.open(path) as f:
    data = json.load(f)
events = data.get("traceEvents", [])
seen = {}
for e in events:
    if e.get("ph") == "X" and e.get("name","").startswith("fusion.3"):
        if e["name"] not in seen:
            seen[e["name"]] = e
for name in ["fusion.339","fusion.375","fusion.334","fusion.364"]:
    e = seen.get(name)
    print(json.dumps(e, indent=1)[:1500], "\n----")
# also print pid/tid name mapping
for e in events[:80]:
    if e.get("ph") == "M":
        print(e)
