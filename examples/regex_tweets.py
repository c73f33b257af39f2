"""Tweet regex workload (BASELINE config 3): hashtags/mentions/urls."""
import os as _os

if _os.environ.get("CUSTRINGS_PLATFORM"):  # e.g. cpu when no TPU reachable
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["CUSTRINGS_PLATFORM"])


import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custrings_tpu import nvstrings

path = "/root/reference/data/tweets.csv"
if os.path.exists(path):
    tweets = nvstrings.from_csv(path, 7)[:200]
else:
    tweets = nvstrings.to_device(["hello #world from @me http://x.co"])

hashtags = tweets.findall_record(r"#\w+")
mentions = tweets.count(r"@\w+")
cleaned = tweets.replace(r"https?://\S+", "<url>")
print("rows:", tweets.size())
print("first hashtags:", [h.to_host() for h in hashtags[:3] if h])
print("mention counts:", mentions[:10])
print("cleaned sample:", cleaned[:1].to_host())
