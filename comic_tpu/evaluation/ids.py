"""Image-id key helpers shared by the scorers.

COCO ids are ints; insta-style ids are arbitrary strings
(insta_prepro.py annotation JSONs). Scorers iterate images in a
deterministic order, so the sort key must tolerate either."""


def id_sort_key(k):
    """ints (COCO) before strings (insta); stable mixed-type sort."""
    return (isinstance(k, str), str(k))
