package org.apache.seatunnel.api.table.catalog;

import org.apache.seatunnel.api.table.type.SeaTunnelDataType;

/**
 * Output-column descriptor returned by DynamicCompile user code (Graft
 * shim of the public seatunnel-api/.../catalog/Column.java surface the
 * reference e2e snippets use).
 */
public class Column {
    private final String name;
    private final SeaTunnelDataType<?> dataType;
    private final boolean nullable;

    protected Column(String name, SeaTunnelDataType<?> dataType, boolean nullable) {
        this.name = name;
        this.dataType = dataType;
        this.nullable = nullable;
    }

    public String getName() {
        return name;
    }

    public SeaTunnelDataType<?> getDataType() {
        return dataType;
    }

    public boolean isNullable() {
        return nullable;
    }
}
