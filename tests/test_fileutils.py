"""K4 guarded overwrite (FileUtils.scala:39-98)."""

from schema_guru_spark.sources.fileutils import is_new_content, write_to_file


def test_fresh_write(tmp_path):
    ok, msg = write_to_file("a.sql", str(tmp_path), "CREATE TABLE t();")
    assert ok and "written successfully" in msg
    assert (tmp_path / "a.sql").read_text() == "CREATE TABLE t();\n"


def test_unchanged_content_not_modified(tmp_path):
    write_to_file("a.sql", str(tmp_path), "CREATE TABLE t();")
    ok, msg = write_to_file("a.sql", str(tmp_path), "CREATE TABLE t();")
    assert ok and "was not modified" in msg


def test_comment_and_whitespace_changes_ignored(tmp_path):
    # regenerated output differing only in SQL comments / blank lines /
    # indentation counts as unchanged (FileUtils.scala:31-33)
    write_to_file("a.sql", str(tmp_path), "-- AUTO-GENERATED\nCREATE TABLE t();")
    regenerated = "-- AUTO-GENERATED v2\n\n  CREATE TABLE t();  \n"
    assert not is_new_content(str(tmp_path / "a.sql"), regenerated)
    ok, msg = write_to_file("a.sql", str(tmp_path), regenerated)
    assert ok and "was not modified" in msg


def test_manual_edit_refused_without_force(tmp_path):
    write_to_file("a.sql", str(tmp_path), "CREATE TABLE t();")
    (tmp_path / "a.sql").write_text("CREATE TABLE t(x INT);\n")  # manual edit
    ok, msg = write_to_file("a.sql", str(tmp_path), "CREATE TABLE t();")
    assert not ok
    assert "probably was modified manually" in msg and "--force" in msg
    # the manual edit survives
    assert (tmp_path / "a.sql").read_text() == "CREATE TABLE t(x INT);\n"


def test_force_overrides(tmp_path):
    write_to_file("a.sql", str(tmp_path), "CREATE TABLE t();")
    (tmp_path / "a.sql").write_text("CREATE TABLE t(x INT);\n")
    ok, msg = write_to_file("a.sql", str(tmp_path), "CREATE TABLE t();",
                            force=True)
    assert ok and "overriden successfully" in msg
    assert (tmp_path / "a.sql").read_text() == "CREATE TABLE t();\n"


def test_missing_file_is_new(tmp_path):
    assert is_new_content(str(tmp_path / "nope.sql"), "x")


def test_cli_ddl_respects_guard(tmp_path):
    import json
    from schema_guru_spark.cli import main
    src = tmp_path / "schemas"
    src.mkdir()
    (src / "thing.json").write_text(json.dumps({
        "self": {"vendor": "com.acme", "name": "thing", "version": "1-0-0"},
        "type": "object",
        "properties": {"id": {"type": "integer"}},
    }))
    out = tmp_path / "out"
    assert main(["ddl", str(src), "--output", str(out)]) == 0
    sql_files = list(out.rglob("*.sql"))
    assert sql_files
    # hand-edit one output, regenerate: guarded failure without --force
    sql_files[0].write_text("-- mine\nCREATE TABLE custom();\n")
    assert main(["ddl", str(src), "--output", str(out)]) == 1
    assert "custom" in sql_files[0].read_text()
    # --force restores generated content
    assert main(["ddl", str(src), "--output", str(out), "--force"]) == 0
    assert "custom" not in sql_files[0].read_text()
