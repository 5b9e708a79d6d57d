"""Data-prep converters against minimal official-format fixtures."""

import json

from visualbert_tpu.tools.prepare_data import (
    prepare_coco_captions,
    prepare_nlvr2,
    prepare_vqa,
)


def test_prepare_coco(tmp_path):
    src = tmp_path / "captions.json"
    src.write_text(json.dumps({
        "annotations": [
            {"image_id": 7, "caption": "a dog"},
            {"image_id": 7, "caption": "a brown dog"},
            {"image_id": 9, "caption": "a cat"},
        ]
    }))
    out = tmp_path / "coco.json"
    n = prepare_coco_captions(str(src), str(out))
    assert n == 2
    data = json.loads(out.read_text())
    assert data[0] == {"image_id": "7", "captions": ["a dog", "a brown dog"]}


def test_prepare_vqa(tmp_path):
    q = tmp_path / "questions.json"
    q.write_text(json.dumps({"questions": [
        {"question": "What color is the dog?", "image_id": 7, "question_id": 70}
    ]}))
    a = tmp_path / "annotations.json"
    a.write_text(json.dumps({"annotations": [
        {"question_id": 70, "answers": [{"answer": "brown"}] * 10}
    ]}))
    out = tmp_path / "imdb.json"
    n = prepare_vqa(str(q), str(out), str(a))
    assert n == 1
    item = json.loads(out.read_text())[0]
    assert item["question_tokens"] == ["what", "color", "is", "the", "dog"]
    assert item["answers"] == ["brown"] * 10
    assert item["image_id"] == "7"


def test_prepare_nlvr2(tmp_path):
    src = tmp_path / "dev.jsonl"
    src.write_text(
        json.dumps({"identifier": "dev-850-0-0", "sentence": "two dogs", "label": "True"})
        + "\n"
        + json.dumps({"identifier": "dev-850-1-0", "sentence": "one cat", "label": "False"})
        + "\n"
    )
    out = tmp_path / "nlvr2.json"
    n = prepare_nlvr2(str(src), str(out))
    assert n == 2
    rows = json.loads(out.read_text())
    assert rows[0]["img0"] == "dev-850-0-img0"
    assert rows[0]["label"] == 1 and rows[1]["label"] == 0


def test_prepare_vcr(tmp_path):
    from visualbert_tpu.tools.prepare_data import prepare_vcr

    row = {
        "img_id": "val-42",
        "question": ["why", "is", [0], "smiling", "?"],
        "answer_choices": [["because", [1]], ["happy"], ["sad"], ["tired"]],
        "answer_label": 0,
        "rationale_choices": [["r1"], ["r2"], ["r3"], ["r4"]],
        "rationale_label": 2,
        "objects": ["person", "dog"],
    }
    src = tmp_path / "val.jsonl"
    src.write_text(json.dumps(row) + "\n")

    out_a = tmp_path / "qa.json"
    assert prepare_vcr(str(src), str(out_a), mode="answer") == 1
    qa = json.loads(out_a.read_text())[0]
    assert qa["label"] == 0 and len(qa["choices"]) == 4
    assert qa["question"][2] == [0]

    out_r = tmp_path / "qar.json"
    prepare_vcr(str(src), str(out_r), mode="rationale")
    qar = json.loads(out_r.read_text())[0]
    # QA→R: question extended with the correct answer
    assert qar["question"][-2:] == ["because", [1]]
    assert qar["label"] == 2


def test_prepare_conceptual_captions(tmp_path):
    from visualbert_tpu.tools.prepare_data import prepare_conceptual_captions

    src = tmp_path / "cc.tsv"
    src.write_text(
        "a dog on a beach\thttp://x/0.jpg\n"
        "a red car\thttp://x/1.jpg\n"
        "\n"
        "caption with\ttab-free url\thttp://x/2.jpg\n"
    )
    out = tmp_path / "cc.json"
    n = prepare_conceptual_captions(str(src), str(out), image_id_prefix="cc_train_")
    assert n == 3
    data = json.loads(out.read_text())
    assert data[0] == {"image_id": "cc_train_0", "sentence": "a dog on a beach"}
    # only the FIRST tab splits caption from url (reference split("\t", 1))
    assert data[2]["sentence"] == "caption with"
    assert data[2]["image_id"] == "cc_train_3"  # line index, blank line skipped


def test_prepare_gqa_both_styles(tmp_path):
    from visualbert_tpu.tools.prepare_data import prepare_gqa

    src = tmp_path / "gqa.json"
    src.write_text(json.dumps({
        "q2": {"imageId": "n100", "question": "what color?", "answer": "red"},
        "q1": {"imageId": "n101", "question": "is it day?"},
    }))
    out = tmp_path / "gqa_vqa.json"
    assert prepare_gqa(str(src), str(out)) == 2
    data = json.loads(out.read_text())
    # sorted by question id; unanswered rows carry no label (test split)
    assert data[0] == {"question_id": "q1", "image_id": "n101", "sent": "is it day?"}
    assert data[1]["label"] == {"red": 1.0}

    out2 = tmp_path / "gqa_pre.json"
    assert prepare_gqa(str(src), str(out2), style="pretrain") == 2
    pre = json.loads(out2.read_text())
    assert pre[1] == {"image_id": "n100", "sentence": "what color?", "ans": "red"}


def test_prepare_open_images_and_image_only_source(tmp_path):
    from visualbert_tpu.tools.prepare_data import prepare_open_images

    d = tmp_path / "manifests"
    d.mkdir()
    (d / "b.txt").write_text("img3\nimg4\n")
    (d / "a.txt").write_text("img1\n\nimg2\n")
    out = tmp_path / "oi.json"
    assert prepare_open_images(str(d), str(out)) == 4
    data = json.loads(out.read_text())
    assert [x["image_id"] for x in data] == ["img1", "img2", "img3", "img4"]
    assert all("sentence" not in x for x in data)  # image-only records


def test_prepare_flickr30k_entities_keeps_unreachable_gold(tmp_path):
    """Chains WITH gold boxes but no IoU-matching proposal keep their entity
    slot with empty region_targets (reference flickr_ban/dataset.py:309-311);
    chains with NO gold box are skipped (dataset.py:299-302)."""
    import json

    from visualbert_tpu.tools.prepare_data import prepare_flickr30k_entities

    sents = tmp_path / "sents"
    anns = tmp_path / "anns"
    sents.mkdir(); anns.mkdir()
    # entity 1: gold box matches proposal 0; entity 2: gold box far away from
    # every proposal (unreachable); entity 3: no gold box in the XML at all
    (sents / "img1.txt").write_text(
        "[/EN#1/people a man] sees [/EN#2/animals a dog] near [/EN#3/notvisual the air]\n"
    )
    (anns / "img1.xml").write_text("""<annotation>
  <object><name>1</name><bndbox><xmin>0</xmin><ymin>0</ymin><xmax>10</xmax><ymax>10</ymax></bndbox></object>
  <object><name>2</name><bndbox><xmin>500</xmin><ymin>500</ymin><xmax>510</xmax><ymax>510</ymax></bndbox></object>
</annotation>""")
    out = str(tmp_path / "out.json")
    n = prepare_flickr30k_entities(
        str(sents), str(anns), ["img1"], out,
        box_source={"img1": [[0, 0, 10, 10], [100, 100, 120, 120]]},
    )
    assert n >= 1
    with open(out) as f:
        rows = json.load(f)
    ents = rows[0]["entities"]
    assert len(ents) == 2  # chain 3 (no gold box) skipped
    assert ents[0]["region_targets"] == [0]   # matched proposal 0
    assert ents[1]["region_targets"] == []    # gold exists, unreachable
