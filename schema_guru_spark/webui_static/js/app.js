// Upload the textarea contents to /upload as multipart form data and
// render the response (schema + errors + duplicate-key warning).
// Field-name convention mirrors the API: "*.json" = one document,
// anything else = NDJSON.
"use strict";

document.getElementById("derive").addEventListener("click", async () => {
  const text = document.getElementById("instances").value;
  const card = document.getElementById("card").value || "0";
  const nd = document.getElementById("ndjson").checked;
  const form = new FormData();
  form.append("enumCardinality", card);
  form.append(nd ? "instances.ndjson" : "instances.json",
              new Blob([text], { type: "application/json" }),
              nd ? "instances.ndjson" : "instances.json");
  const schemaEl = document.getElementById("schema");
  const errorsEl = document.getElementById("errors");
  const warnEl = document.getElementById("warning");
  try {
    const resp = await fetch("/upload", { method: "POST", body: form });
    const out = await resp.json();
    schemaEl.textContent = JSON.stringify(out.schema || {}, null, 2);
    errorsEl.textContent = (out.errors && out.errors.length)
      ? JSON.stringify(out.errors, null, 2) : "(none)";
    if (out.warning) {
      warnEl.textContent = out.warning.message + ": "
        + out.warning.items.join(", ");
      warnEl.classList.remove("hidden");
    } else {
      warnEl.classList.add("hidden");
    }
  } catch (e) {
    errorsEl.textContent = String(e);
  }
});
