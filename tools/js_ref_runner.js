// Differential-test harness: runs one RBQL query through the reference
// rbql-js engine (loaded read-only from /root/reference/rbql-js) and
// prints {rows, header, warnings} or {error_type, error_msg} as JSON.
// Protocol: JSON request on stdin:
//   {query, input_table, input_column_names?, join_table?,
//    join_column_names?, user_init_code?}
// Used by tests/test_js_differential.py — NOT part of the engine.
const rbql = require('/root/reference/rbql-js/rbql.js');

let chunks = [];
process.stdin.on('data', (d) => chunks.push(d));
process.stdin.on('end', async () => {
    const requests = JSON.parse(chunks.join(''));
    const out = [];
    for (const req of requests) {
        const output_table = [];
        const warnings = [];
        const output_column_names = [];
        try {
            await rbql.query_table(
                req.query, req.input_table, output_table, warnings,
                req.join_table || null, req.input_column_names || null,
                req.join_column_names || null, output_column_names,
                req.user_init_code || '');
            out.push({ok: true, rows: output_table, warnings: warnings,
                      header: output_column_names.length ? output_column_names : null});
        } catch (e) {
            const [etype, emsg] = rbql.exception_to_error_info(e);
            out.push({ok: false, error_type: etype, error_msg: emsg});
        }
    }
    // JSON can't carry NaN/Infinity/undefined — tag them so the Python
    // comparator can normalize both sides identically
    const replacer = (k, v) => {
        if (typeof v === 'number' && !isFinite(v))
            return isNaN(v) ? '__NaN__' : (v > 0 ? '__Infinity__' : '__-Infinity__');
        if (v === undefined) return '__undefined__';
        return v;
    };
    process.stdout.write(JSON.stringify(out, replacer));
});
